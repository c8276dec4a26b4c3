"""Base stage-model: device mesh, optimizers, checkpointing, validation.

Parity target: mmsr/models/base_model.py. The torch device/DDP plumbing
(model_to_device :62-75) becomes mesh + sharding (params replicated, batch
sharded — XLA all-reduces gradients over ICI); scheduler setup (:77-108)
becomes optax schedule multipliers; save/load (:185-307) keeps the
reference's artifact roles (net_<label>_<iter> weights + <iter>.state
trainer state, 'latest' alias) in flax msgpack, with transparent .pth
import for reference-pretrained weights.
"""
import logging
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..parallel import get_mesh, replicate, shard_batch
from ..utils import pth_import
from .lr_scheduler import build_schedule

logger = logging.getLogger('base')


def shift_schedule_count(opt_state, by):
    """Advance every ScaleByScheduleState count in an optax state tree by
    ``by`` iterations WITHOUT an optimizer update.

    Reference-parity necessity: the reference steps every scheduler in
    self.schedulers once per training iteration (base_model.py:155-167;
    lr_steps milestones are ABSOLUTE iteration numbers), while each
    torch optimizer itself only steps in its own phase. Our schedules
    read the count stored in the optimizer state, which advances only
    on actual updates — so phase-skipped iterations must advance it
    explicitly:

    - the D optimizer starts with count = net_g_pretrain_steps (its
      scheduler — the ONLY scheduler stage 3 has upstream, see
      RefRestorationModel.init_training_settings — "ran" through the
      whole G-pretrain phase: with the shipped stage-3 config, pretrain
      10k + milestone 72 545, D's first decay lands at iteration
      72 545, not 82 545);
    - G's count is bumped by 1 on D-only iterations (net_d_steps > 1 /
      net_d_init_steps > 0, the lax.cond skip branch). This only
      matters under ``train.schedule_net_g: true``; with the
      reference-faithful default (G unscheduled in stage 3) opt_g
      contains no ScaleByScheduleState and the bump is a structural
      no-op.

    The Adam moment/bias-correction count (ScaleByAdamState) is NOT
    touched — torch Adam's per-param step also only advances on real
    optimizer.step() calls.
    """
    def visit(s):
        if isinstance(s, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(count=s.count + by)
        return s

    return jax.tree.map(
        visit, opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState))


def _scale_by_tree(lr_tree):
    """optax transform multiplying each update leaf by a per-leaf factor
    (the 4-LR-group split, ref_restoration_model.py:70-85)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, lr_tree), state

    return optax.GradientTransformation(init, update)


def _scale_by_tree_schedule(lr_tree, lr_fn):
    """Per-leaf scheduled LR: each leaf is scaled by -lr_fn(step, lr_leaf)
    with its OWN base LR — exact for schedules that are affine in the
    base LR per group (CosineAnnealingRestartLR's absolute eta_min
    floor, lr_scheduler.py:50-107), where a shared scalar multiplier of
    lr_g would mis-scale the other groups' floors."""

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        del params
        updates = jax.tree.map(
            lambda u, lr: u * (-lr_fn(state.count, lr)), updates, lr_tree)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def make_adam(base_lr, betas=(0.9, 0.999), weight_decay=0.0,
              schedule_fn=None, lr_tree=None, eps=1e-8):
    """torch.optim.Adam-faithful optimizer:
    update = -lr(step) * m_hat / (sqrt(v_hat) + eps), with torch-style L2
    weight decay folded into the gradient before the moments.
    ``schedule_fn`` is lr_fn(step, base_lr) -> lr (lr_scheduler.py)."""
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    if schedule_fn is None:
        if lr_tree is not None:
            txs.append(_scale_by_tree(lr_tree))
            txs.append(optax.scale(-1.0))
        else:
            txs.append(optax.scale(-base_lr))
    elif lr_tree is not None:
        txs.append(_scale_by_tree_schedule(lr_tree, schedule_fn))
    else:
        txs.append(optax.scale_by_schedule(
            lambda step: -schedule_fn(step, base_lr)))
    return optax.chain(*txs)


class BaseModel:
    """Shared infrastructure for all stage models (API parity with
    base_model.py:31-57: feed_data/optimize_parameters/test/validation/
    save/resume_training are implemented by subclasses)."""

    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt['is_train']
        self.rank = jax.process_index()
        self.mesh = get_mesh()
        self.log_dict = {}
        self.schedule_fn = None
        if self.is_train and opt.get('train'):
            self.schedule_fn = build_schedule(opt['train'])

    # ------------------------------------------------------------------ util
    def replicate(self, tree):
        return replicate(tree, self.mesh)

    def shard_batch(self, batch, spatial=False):
        return shard_batch(batch, self.mesh, spatial=spatial)

    def print_network(self, module, variables=None):
        name = module.__class__.__name__
        if variables is not None:
            n = sum(int(np.prod(p.shape))
                    for p in jax.tree.leaves(variables))
            logger.info(f'Network: {name}, with parameters: {n:,d}')
        else:
            logger.info(f'Network: {name}')

    def current_learning_rates(self, step):
        """Host-side LR report for logging (base_model.py:179-183)."""
        if self.schedule_fn is None:
            return list(self.base_lrs())
        return [float(self.schedule_fn(step, lr)) for lr in self.base_lrs()]

    def base_lrs(self):
        return [self.opt['train'].get('lr_g', 0) or 0]

    # ---------------------------------------------------------- checkpoints
    def _model_dir(self):
        return self.opt['path']['models']

    def save_network(self, variables, net_label, current_iter):
        """net_<label>_<iter>.ckpt + net_<label>_latest.ckpt
        (base_model.py:185-206; -1 => latest only).

        ``path.checkpoint_backend: orbax`` (opt-in YAML flag) switches
        network checkpoints to orbax AsyncCheckpointer directories
        (net_<label>_<iter>.orbax) — the save runs in the background so
        long stage-3 runs do not stall on checkpoint IO. msgpack stays
        the default format."""
        if self.rank != 0:
            return
        os.makedirs(self._model_dir(), exist_ok=True)
        if self.opt['path'].get('checkpoint_backend') == 'orbax':
            tree = jax.tree.map(np.asarray, jax.device_get(variables))
            import orbax.checkpoint as ocp
            ckptr = self._orbax_checkpointer()
            targets = [f'{net_label}_latest.orbax']
            if current_iter != -1:
                targets.insert(0, f'{net_label}_{current_iter}.orbax')
            for name in targets:
                ckptr.save(osp.abspath(osp.join(self._model_dir(), name)),
                           args=ocp.args.StandardSave(tree), force=True)
            return
        data = serialization.msgpack_serialize(
            jax.tree.map(np.asarray, jax.device_get(variables)))
        if current_iter != -1:
            path = osp.join(self._model_dir(),
                            f'{net_label}_{current_iter}.ckpt')
            with open(path, 'wb') as f:
                f.write(data)
        latest = osp.join(self._model_dir(), f'{net_label}_latest.ckpt')
        with open(latest, 'wb') as f:
            f.write(data)

    def _orbax_checkpointer(self):
        if not hasattr(self, '_orbax_ckptr'):
            import atexit
            import orbax.checkpoint as ocp
            self._orbax_ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
            atexit.register(self._orbax_ckptr.wait_until_finished)
        return self._orbax_ckptr

    def finalize_checkpoints(self):
        """Block until any in-flight async (orbax) checkpoint saves have
        committed. No-op for the msgpack backend."""
        if hasattr(self, '_orbax_ckptr'):
            self._orbax_ckptr.wait_until_finished()

    def load_network(self, path, kind):
        """Load weights from .ckpt (ours) or .pth (reference format;
        base_model.py:208-265 load tolerance becomes explicit import
        shims). ``kind``: g | d | extractor | teacher | student | vgg19 |
        vgg16."""
        logger.info(f'Loading {kind} model from {path}.')
        if path.endswith('.pth'):
            if kind in ('extractor', 'teacher', 'student'):
                return pth_import.import_contras_extractor(path)
            if kind == 'g':
                return pth_import.import_restoration_net(path)
            if kind == 'd':
                return pth_import.import_discriminator(path)
            if kind.startswith('vgg'):
                return pth_import.import_torchvision_vgg(path, kind)
            raise ValueError(f'unknown .pth kind {kind}')
        if path.endswith('.orbax') or osp.isdir(path):
            import orbax.checkpoint as ocp
            self.finalize_checkpoints()
            with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ck:
                return ck.restore(osp.abspath(path))
        with open(path, 'rb') as f:
            return serialization.msgpack_restore(f.read())

    @staticmethod
    def merge_loaded(init_variables, loaded):
        """Graft loaded leaves onto an init tree (keeps missing leaves,
        mirrors the reference's non-strict load warnings,
        base_model.py:208-243)."""

        def merge(init_node, loaded_node, path=''):
            if not isinstance(init_node, dict):
                arr = jnp.asarray(loaded_node)
                if arr.shape != init_node.shape:
                    logger.warning(
                        f'shape mismatch at {path}: checkpoint '
                        f'{arr.shape} vs model {init_node.shape}; keeping '
                        'model init')
                    return init_node
                return arr.astype(init_node.dtype)
            out = {}
            for k, v in init_node.items():
                if loaded_node is not None and k in loaded_node:
                    out[k] = merge(v, loaded_node[k], f'{path}/{k}')
                else:
                    logger.warning(f'missing key in checkpoint: {path}/{k}')
                    out[k] = v
            for k in (loaded_node or {}):
                if k not in init_node:
                    logger.warning(f'unexpected key in checkpoint: '
                                   f'{path}/{k}')
            return out

        return merge(init_variables, loaded)

    def save_training_state(self, epoch, current_iter, state_tree):
        """<iter>.state with {epoch, iter, optimizer/scheduler state}
        (base_model.py:267-290)."""
        if self.rank != 0 or current_iter == -1:
            # the reference writes no state file for the 'latest' save
            # (base_model.py:271-273)
            return
        state_dir = self.opt['path']['training_state']
        os.makedirs(state_dir, exist_ok=True)
        payload = {
            'epoch': np.asarray(epoch),
            'iter': np.asarray(current_iter),
            'state': jax.tree.map(
                np.asarray,
                serialization.to_state_dict(jax.device_get(state_tree))),
        }
        with open(osp.join(state_dir, f'{current_iter}.state'), 'wb') as f:
            f.write(serialization.msgpack_serialize(payload))

    def load_training_state(self, path, state_template):
        """Restore a .state file onto the live optimizer-state structure."""
        with open(path, 'rb') as f:
            raw = serialization.msgpack_restore(f.read())
        state = serialization.from_state_dict(state_template, raw['state'])
        return int(raw['epoch']), int(raw['iter']), state

    # ------------------------------------------------------------ validation
    def validation(self, dataloader, current_iter, tb_logger,
                   save_img=False):
        """Dispatch mirroring base_model.py:44-57. The reference never
        distributes eval (sr_model.py:160-162 falls back to the
        single-process loop); here multi-process runs shard the val set
        by jax.process_index() and aggregate metrics."""
        if jax.process_count() > 1:
            return self.dist_validation(dataloader, current_iter, tb_logger,
                                        save_img)
        return self.nondist_validation(dataloader, current_iter, tb_logger,
                                       save_img)

    def nondist_validation(self, *args, **kwargs):
        raise NotImplementedError

    def dist_validation(self, dataloader, current_iter, tb_logger,
                        save_img=False):
        self.nondist_validation(dataloader, current_iter, tb_logger,
                                save_img)
