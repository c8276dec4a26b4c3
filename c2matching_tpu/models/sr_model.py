"""Plain single-image SR stage-model (base for RefRestorationModel).

Parity target: mmsr/models/sr_model.py (:20-220): Adam over net_g, pixel
(+ optional perceptual) loss, PSNR validation loop with image dumps. The
x8 self-ensemble (test_x8, :123-158) is provided as a flag on test().
"""
import functools
import logging
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import ProgressBar, imwrite, metrics, tensor2img
from ..utils.registry import MODEL_REGISTRY
from . import networks
from .base_model import BaseModel, make_adam
from .losses import LOSS_REGISTRY, PerceptualLoss

logger = logging.getLogger('base')


@MODEL_REGISTRY.register
class SRModel(BaseModel):
    """Single-image SR: net_g(img_in_lq) -> output vs gt."""

    def __init__(self, opt):
        super().__init__(opt)
        self.net_g = networks.define_net_g(opt)
        self._init_net_g()
        if self.is_train and type(self) is SRModel:
            self.init_training_settings()

    def _init_net_g(self):
        rng = jax.random.PRNGKey(self.opt.get('manual_seed') or 0)
        self.vars_g = self._init_g_variables(rng)
        load_path = self.opt['path'].get('pretrain_model_g')
        if load_path:
            self.vars_g = self.merge_loaded(
                self.vars_g, self.load_network(load_path, 'g'))
        self.vars_g = self.replicate(self.vars_g)
        self.print_network(self.net_g, self.vars_g)

    def _init_g_variables(self, rng):
        dummy = jnp.zeros((1, 40, 40, 3))
        return jax.jit(self.net_g.init)(rng, dummy)

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.cri_pix = None
        if train_opt.get('pixel_weight', 0) > 0:
            cls = LOSS_REGISTRY.get(train_opt['pixel_criterion'])
            self.cri_pix = cls(loss_weight=train_opt['pixel_weight'],
                               reduction='mean')
        # optional perceptual term (sr_model.py:94-115)
        self.cri_perceptual = None
        self.vars_perceptual = None
        if train_opt.get('perceptual_opt'):
            self.cri_perceptual = PerceptualLoss(
                **dict(train_opt['perceptual_opt']))
            dummy = jnp.zeros((1, 64, 64, 3))
            self.vars_perceptual = self.replicate(
                jax.jit(self.cri_perceptual.init)(
                    jax.random.PRNGKey(11), dummy, dummy))
        self.tx = make_adam(
            train_opt['lr_g'],
            betas=tuple(train_opt.get('beta_g') or (0.9, 0.999)),
            weight_decay=train_opt.get('weight_decay_g', 0) or 0,
            schedule_fn=self.schedule_fn)
        self.opt_state = self.replicate(self.tx.init(self.vars_g['params']))
        self._train_step = self._build_train_step()
        self.log_dict = {}

    def _build_train_step(self):

        def loss_fn(params, batch, perceptual_vars):
            out = self.net_g.apply({'params': params}, batch['img_in_lq'])
            logs = {}
            total = 0.
            if self.cri_pix is not None:
                l_pix = self.cri_pix(out, batch['img_in'])
                total += l_pix
                logs['l_pix'] = l_pix
            if self.cri_perceptual is not None:
                l_percep, l_style = self.cri_perceptual.apply(
                    perceptual_vars, out, batch['img_in'])
                if l_percep is not None:
                    total += l_percep
                    logs['l_percep'] = l_percep
                if l_style is not None:
                    total += l_style
                    logs['l_style'] = l_style
            return total, logs

        @jax.jit
        def step(params, opt_state, batch, perceptual_vars):
            (_total, logs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, perceptual_vars)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, logs

        return step

    def feed_data(self, batch):
        self.batch = self.shard_batch(
            {k: v for k, v in batch.items()
             if isinstance(v, np.ndarray)})
        self.meta = {k: v for k, v in batch.items()
                     if not isinstance(v, np.ndarray)}

    def optimize_parameters(self, step):
        params, self.opt_state, logs = self._train_step(
            self.vars_g['params'], self.opt_state, self.batch,
            self.vars_perceptual)
        self.vars_g = dict(self.vars_g, params=params)
        # keep device arrays; MessageLogger converts at print time
        self.log_dict = logs

    # eval forwards are jitted lazily (one executable per input shape,
    # cached by jax) — eager apply would pay one tunnel roundtrip per
    # primitive on the real TPU (CLAUDE.md platform gotchas)
    @functools.cached_property
    def _eval_fwd(self):
        return jax.jit(
            lambda p, x: self.net_g.apply({'params': p}, x))

    @functools.cached_property
    def _eval_fwd_x8(self):
        def ensemble(p, lq):
            outs = []
            for rot in range(4):
                xr = jnp.rot90(lq, k=rot, axes=(1, 2))
                for flip in (False, True):
                    xf = jnp.flip(xr, axis=2) if flip else xr
                    y = self.net_g.apply({'params': p}, xf)
                    if flip:
                        y = jnp.flip(y, axis=2)
                    y = jnp.rot90(y, k=-rot, axes=(1, 2))
                    outs.append(y)
            return sum(outs) / len(outs)

        return jax.jit(ensemble)

    def test(self):
        self.output = self._eval_fwd(self.vars_g['params'],
                                     self.batch['img_in_lq'])

    def test_x8(self):
        """x8 self-ensemble: average the outputs over the 8 dihedral
        transforms of the input (sr_model.py:123-158), one fused jit."""
        self.output = self._eval_fwd_x8(self.vars_g['params'],
                                        self.batch['img_in_lq'])

    # -------- shared validation loop (sr_model.py:164-208 pattern,
    # extended with PSNR_Y/SSIM_Y by RefRestorationModel :295-370)
    def _validation_images(self, val_data):
        self.feed_data(val_data)
        # `val: use_x8: true` switches validation to the x8 self-ensemble
        # (the reference defines test_x8 at sr_model.py:123-158 but never
        # wires it to a config — dead code there; here it is reachable)
        if (self.opt.get('val') or {}).get('use_x8'):
            self.test_x8()
        else:
            self.test()
        sr_img = tensor2img(np.asarray(jax.device_get(self.output)))
        gt_img = tensor2img(np.asarray(val_data['img_in']))
        padding = val_data.get('padding', [False])[0] \
            if isinstance(val_data.get('padding'), (list, np.ndarray)) \
            else val_data.get('padding', False)
        original_size = val_data.get('original_size')
        if original_size is not None:
            orig = original_size[0] if isinstance(original_size, list) \
                else original_size
            if padding:
                sr_img = sr_img[:orig[0], :orig[1]]
        return sr_img, gt_img

    # metric-name -> log label, in log order (sr_model.py:185-208;
    # RefRestorationModel extends with PSNR_Y/SSIM_Y)
    _VAL_METRIC_LABELS = {'psnr': 'PSNR'}
    _VAL_LOG_PER_IMAGE = False  # reference SRModel logs only the summary

    def _compute_val_metrics(self, sr_img, gt_img):
        return {'psnr': metrics.psnr(sr_img, gt_img,
                                     crop_border=self.opt['crop_border'])}

    def _validation_loop(self, dataloader, current_iter, tb_logger,
                         save_img, rank=0, world=1):
        """Shared validation loop; with world > 1 each process handles
        every world-th image and metric sums are all-reduced across
        processes (exceeds the reference, which always evaluates the
        full set on every rank)."""
        from ..parallel.mesh import allreduce_sum_across_processes

        pbar = ProgressBar(len(dataloader))
        dataset_name = dataloader.dataset.opt['name']
        names = list(self._VAL_METRIC_LABELS)
        sums = {k: 0. for k in names}
        count = 0
        for idx, val_data in enumerate(dataloader):
            if idx % world != rank:
                continue
            img_name = osp.splitext(
                osp.basename(val_data['lq_path'][0]))[0]
            sr_img, gt_img = self._validation_images(val_data)
            if save_img:
                self._save_val_image(sr_img, img_name, dataset_name,
                                     current_iter)
            vals = self._compute_val_metrics(sr_img, gt_img)
            for k in names:
                sums[k] += vals[k]
            count += 1
            if not self.is_train and self._VAL_LOG_PER_IMAGE:
                logger.info(f'# img {img_name} ' + ' '.join(
                    f'# {self._VAL_METRIC_LABELS[k]}: {vals[k]:.4e}'
                    for k in names) + '.')
            pbar.update(f'Test {img_name}')
        if world > 1:
            vec = allreduce_sum_across_processes(
                [sums[k] for k in names] + [count])
            sums = dict(zip(names, vec[:-1]))
            count = vec[-1]
        avgs = {k: sums[k] / max(count, 1) for k in names}
        logger.info(f'# Validation {dataset_name} ' + ' '.join(
            f'# {self._VAL_METRIC_LABELS[k]}: {avgs[k]:.4e}'
            for k in names) + '.')
        if tb_logger:
            for k in names:
                tb_logger.add_scalar(k, avgs[k], current_iter)
        return avgs

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img=False):
        return self._validation_loop(dataloader, current_iter, tb_logger,
                                     save_img)

    def dist_validation(self, dataloader, current_iter, tb_logger,
                        save_img=False):
        import jax as _jax
        return self._validation_loop(
            dataloader, current_iter, tb_logger, save_img,
            rank=_jax.process_index(), world=_jax.process_count())

    def _save_val_image(self, sr_img, img_name, dataset_name, current_iter):
        if self.opt['is_train']:
            save_img_path = osp.join(self.opt['path']['visualization'],
                                     img_name,
                                     f'{img_name}_{current_iter}.png')
        else:
            save_img_path = osp.join(self.opt['path']['visualization'],
                                     dataset_name,
                                     f"{img_name}_{self.opt['name']}.png")
            if self.opt.get('suffix'):
                save_img_path = save_img_path.replace(
                    '.png', f"_{self.opt['suffix']}.png")
        imwrite(sr_img, save_img_path)

    def save(self, epoch, current_iter):
        self.save_network(self.vars_g, 'net_g', current_iter)
        self.save_training_state(epoch, current_iter,
                                 {'opt_g': self.opt_state})

    def resume_training(self, state_path):
        epoch, it, state = self.load_training_state(
            state_path, {'opt_g': self.opt_state})
        self.opt_state = self.replicate(state['opt_g'])
        return epoch, it
