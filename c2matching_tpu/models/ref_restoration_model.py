"""Stage-3 model: reference-based restoration (MSE then GAN).

Parity target: mmsr/models/ref_restoration_model.py (:19-370). The torch
forward/backward flow becomes jitted step functions:

- ``match``: extractor + correspondence generation, stop-gradient (neither
  is trained in stage 3; the reference runs net_map under grad but no
  trainable params receive those gradients).
- ``g_pretrain_step``: match + pixel loss only (steps <=
  net_g_pretrain_steps, :199-207), one fused jit.
- ``gan_step``: the whole GAN iteration in ONE fused, donated jit —
  match -> a single G forward captured with jax.vjp -> D update (WGAN
  real/fake + gradient penalty, :209-232 — grad-of-grad through the
  discriminator) -> G update (pixel + perceptual(fro) + GAN-G losses,
  :234-269). The G gradient is the vjp of the loss-on-output cotangent,
  so the G forward runs exactly once per iteration (the reference
  retains one autograd graph the same way); the GAN-G term reads the
  UPDATED discriminator, matching the reference's update order, and runs
  it in TRAIN mode (BN batch statistics, running stats persisted) —
  exactly the reference's ``fake_g_pred = net_d(output)`` with net_d
  never leaving train mode (:263). The (net_d_steps, net_d_init_steps)
  gating (:241-242) enters as a static ``do_g`` flag.

``_build_d_step``/``_build_g_step``/``_build_forward`` retain the
round-1 unfused steps; tests pin fused-vs-unfused equivalence on them.

Optimizer parity: 4 Adam param groups keyed on the same name substrings
('offset' x 'small'/'medium', :56-68) realized as a per-leaf LR tree.
LR-schedule parity: upstream schedules ONLY net_d in stage 3 (its
optimizer_g is appended after setup_schedulers already ran, :22,87) —
see init_training_settings for the faithful default and the
``train.schedule_net_g`` opt-in.
"""
import functools
import logging
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import metrics, tensor2img
from ..utils.registry import MODEL_REGISTRY
from . import networks
from .base_model import make_adam, shift_schedule_count
from .losses import LOSS_REGISTRY, PerceptualLoss, gan_loss, \
    gradient_penalty_loss
from .sr_model import SRModel

logger = logging.getLogger('base')


def _offset_lr_tree(params, train_opt):
    """Per-leaf LR from the reference's name-substring grouping
    (ref_restoration_model.py:56-68)."""
    lr_g = train_opt['lr_g']
    lr_offset = train_opt.get('lr_offset', lr_g) or lr_g
    lr_relu2 = train_opt.get('lr_relu2_offset', lr_offset) or lr_offset
    lr_relu3 = train_opt.get('lr_relu3_offset', lr_offset) or lr_offset

    def label(path):
        name = '/'.join(str(getattr(p, 'key', p)) for p in path)
        if 'offset' in name:
            if 'small' in name:
                return lr_relu3
            if 'medium' in name:
                return lr_relu2
            return lr_offset
        return lr_g

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: label(path), params)


@MODEL_REGISTRY.register
class RefRestorationModel(SRModel):

    def __init__(self, opt):
        # --- nets (SRModel.__init__ builds net_g via _init_g_variables)
        self.net_map = networks.define_net_map(opt)
        self.net_extractor = networks.define_net_extractor(opt)
        super().__init__(opt)

        rng = jax.random.PRNGKey(opt.get('manual_seed') or 0)
        dummy = jnp.zeros((1, 64, 64, 3))
        # jit the init-time forwards: eager applies dispatch one tunnel
        # roundtrip per primitive and take minutes at model creation
        self.vars_extractor = jax.jit(self.net_extractor.init)(rng, dummy,
                                                               dummy)
        feats = jax.jit(self.net_extractor.apply)(self.vars_extractor,
                                                  dummy, dummy)
        self.vars_map = jax.jit(self.net_map.init)(rng, feats, dummy)

        load_path = self.opt['path'].get('pretrain_model_feature_extractor')
        if load_path:
            self.vars_extractor = self.merge_loaded(
                self.vars_extractor,
                self.load_network(load_path, 'extractor'))
        load_path = self.opt['path'].get('pretrain_model_vgg')
        if load_path:
            # optional torchvision vgg19 for net_map + perceptual loss
            vgg_vars = self.load_network(
                load_path, self.net_map.vgg_type)
            self.vars_map = self.merge_loaded(
                self.vars_map,
                {'params': {'vgg': vgg_vars['params']}})
        self.vars_extractor = self.replicate(self.vars_extractor)
        self.vars_map = self.replicate(self.vars_map)

        self._match = self._build_match()
        self._forward = self._build_forward()

        if self.is_train:
            self.init_training_settings()

    def _init_g_variables(self, rng):
        lr_size = 40
        dummy_lr = jnp.zeros((1, lr_size, lr_size, 3))
        h = lr_size
        pre_offset = {
            'relu3_1': jnp.zeros((1, 9, h, h, 2)),
            'relu2_1': jnp.zeros((1, 9, 2 * h, 2 * h, 2)),
            'relu1_1': jnp.zeros((1, 9, 4 * h, 4 * h, 2)),
        }
        ref_feat = {
            'relu3_1': jnp.zeros((1, h, h, 256)),
            'relu2_1': jnp.zeros((1, 2 * h, 2 * h, 128)),
            'relu1_1': jnp.zeros((1, 4 * h, 4 * h, 64)),
        }
        return jax.jit(self.net_g.init)(rng, dummy_lr, pre_offset,
                                        ref_feat)

    # ------------------------------------------------------------ builders
    def _match_graph(self, extractor_params, map_vars, img_in_up, img_ref,
                     valid_shape=None):
        """Extractor + correspondence generation subgraph (traced inline
        into the fused train steps and into the standalone _match jit).

        ``valid_shape``: (vh, vw) valid HR sizes when the eval batch is
        bucket-padded — threaded through the extractor/matcher/VGG so the
        valid region computes exactly the exact-shape values (training
        passes None: train crops are never padded)."""
        feats = self.net_extractor.apply(extractor_params, img_in_up,
                                         img_ref, valid_shape)
        pre_offset, img_ref_feat = self.net_map.apply(map_vars, feats,
                                                      img_ref, valid_shape)
        return (jax.tree.map(jax.lax.stop_gradient, pre_offset),
                jax.tree.map(jax.lax.stop_gradient, img_ref_feat))

    def _build_match(self):
        return jax.jit(self._match_graph)

    def _build_forward(self):

        @jax.jit
        def forward(g_params, img_in_lq, pre_offset, img_ref_feat,
                    valid_shape=None):
            return self._g_forward_with_stats(g_params, img_in_lq,
                                              pre_offset, img_ref_feat,
                                              valid_shape)

        return forward

    def init_training_settings(self):
        train_opt = self.opt['train']

        # --- discriminator
        self.net_d = None
        if self.opt.get('network_d'):
            self.net_d = networks.define_net_d(self.opt)
            rng = jax.random.PRNGKey(7)
            self.vars_d = jax.jit(
                functools.partial(self.net_d.init, train=False))(
                    rng, jnp.zeros((1, 160, 160, 3)))
            load_path = self.opt['path'].get('pretrain_model_d')
            if load_path:
                self.vars_d = self.merge_loaded(
                    self.vars_d, self.load_network(load_path, 'd'))
            self.vars_d = self.replicate(self.vars_d)
            self.print_network(self.net_d, self.vars_d)
        else:
            logger.info('No discriminator.')

        # --- losses
        self.cri_pix = None
        if train_opt.get('pixel_weight', 0) > 0:
            cls = LOSS_REGISTRY.get(train_opt['pixel_criterion'])
            self.cri_pix = cls(loss_weight=train_opt['pixel_weight'],
                               reduction='mean')
        else:
            logger.info('Remove pixel loss.')

        self.cri_perceptual = None
        self.vars_perceptual = None
        if train_opt.get('perceptual_opt'):
            self.cri_perceptual = PerceptualLoss(
                **{k: v for k, v in train_opt['perceptual_opt'].items()})
            dummy = jnp.zeros((1, 64, 64, 3))
            self.vars_perceptual = self.replicate(
                jax.jit(self.cri_perceptual.init)(
                    jax.random.PRNGKey(11), dummy, dummy))
        else:
            logger.info('Remove perceptual loss.')

        self.gan_type = train_opt.get('gan_type')
        self.gan_weight = train_opt.get('gan_weight', 0) or 0
        self.grad_penalty_weight = train_opt.get('grad_penalty_weight',
                                                 0) or 0
        if not self.gan_type:
            logger.info('Remove GAN loss.')

        self.net_g_pretrain_steps = train_opt['net_g_pretrain_steps']
        self.net_d_steps = train_opt.get('net_d_steps') or 1
        self.net_d_init_steps = train_opt.get('net_d_init_steps') or 0
        if self.net_d_steps > 1 or self.net_d_init_steps > 0:
            logger.info(
                f'net_d_steps={self.net_d_steps} / net_d_init_steps='
                f'{self.net_d_init_steps}: D-only iterations exist, so '
                'the fused GAN step takes do_g as a traced boolean '
                '(lax.cond around the G phase) — ONE compiled '
                'executable for both iteration kinds.')

        # --- optimizers
        # Upstream ordering quirk (reference parity): RefRestorationModel
        # appends optimizer_g in __init__ AFTER SRModel.__init__ already
        # ran init_training_settings -> setup_schedulers()
        # (ref_restoration_model.py:22,87 vs sr_model.py:39,
        # base_model.py:77-108), so the reference schedules ONLY the
        # discriminator in EVERY stage-3 config: G's 4 groups keep their
        # base LRs forever (lr_steps never decays them) and any
        # warmup_iter > 0 crashes upstream (_get_init_lr KeyError —
        # optimizer_g's groups never get 'initial_lr'). The default here
        # reproduces the G-constant-LR behavior the published models
        # were trained with; ``train.schedule_net_g: true`` opts into
        # the evidently intended both-scheduled semantics (G's schedule
        # count then advances once per ITERATION via
        # shift_schedule_count, including on D-only iterations).
        self._schedule_g = bool(train_opt.get('schedule_net_g'))
        lr_tree = _offset_lr_tree(self.vars_g['params'], train_opt)
        self.tx_g = make_adam(
            train_opt['lr_g'],
            betas=tuple(train_opt.get('beta_g') or (0.9, 0.999)),
            weight_decay=train_opt.get('weight_decay_g', 0) or 0,
            schedule_fn=self.schedule_fn if self._schedule_g else None,
            lr_tree=lr_tree)
        self.opt_state_g = self.replicate(
            self.tx_g.init(self.vars_g['params']))

        if self.net_d:
            self.tx_d = make_adam(
                train_opt['lr_d'],
                betas=tuple(train_opt.get('beta_d') or (0.9, 0.999)),
                weight_decay=train_opt.get('weight_decay_d', 0) or 0,
                schedule_fn=self.schedule_fn)
            self.opt_state_d = self.replicate(
                self.tx_d.init(self.vars_d['params']))
            if self.net_g_pretrain_steps:
                # the reference steps D's scheduler through the whole
                # G-pretrain phase (lr milestones are absolute iteration
                # numbers) — see shift_schedule_count
                self.opt_state_d = shift_schedule_count(
                    self.opt_state_d, self.net_g_pretrain_steps)

        self._g_pretrain_step = self._build_g_pretrain_step()
        if self.net_d:
            self._d_step = self._build_d_step()
        self._g_step = self._build_g_step()
        self._gan_step = self._build_gan_step()
        self._rng = jax.random.PRNGKey(
            self.opt.get('manual_seed') or 0)
        self.log_dict = {}

    def base_lrs(self):
        t = self.opt['train']
        lrs = [t['lr_g'], t.get('lr_offset', t['lr_g']),
               t.get('lr_relu3_offset', t['lr_g']),
               t.get('lr_relu2_offset', t['lr_g'])]
        if self.net_d:
            lrs.append(t['lr_d'])
        return lrs

    def current_learning_rates(self, step):
        """Stage-3 LR report: only net_d's LR follows the schedule (the
        reference's upstream ordering quirk — see
        init_training_settings); G's 4 groups stay at their base LRs
        unless ``train.schedule_net_g`` is on. The reference's own log
        line shows optimizers[0] = optimizer_d's LR."""
        out = []
        n_g = 4
        for i, lr in enumerate(self.base_lrs()):
            scheduled = (i >= n_g or getattr(self, '_schedule_g', False))
            out.append(float(self.schedule_fn(step, lr))
                       if scheduled and self.schedule_fn is not None
                       else float(lr))
        return out

    # --------------------------------------------------------------- steps
    def _out_losses(self, output, gt, d_vars, perceptual_vars, with_gan):
        """G losses as a function of the G OUTPUT (pixel + perceptual +
        GAN-G, ref_restoration_model.py:234-269); the fused step back-
        propagates its cotangent through one saved jax.vjp of the G
        forward."""
        logs = {}
        total = 0.
        if self.cri_pix is not None:
            l_g_pix = self.cri_pix(output, gt)
            total += l_g_pix
            logs['l_g_pix'] = l_g_pix
        if self.cri_perceptual is not None and perceptual_vars is not None:
            l_g_percep, l_g_style = self.cri_perceptual.apply(
                perceptual_vars, output, gt)
            if l_g_percep is not None:
                total += l_g_percep
                logs['l_g_percep'] = l_g_percep
            if l_g_style is not None:
                total += l_g_style
                logs['l_g_style'] = l_g_style
        new_dstate = None
        if with_gan and d_vars is not None:
            # reference parity: fake_g_pred = net_d(output) with net_d in
            # TRAIN mode (ref_restoration_model.py:263) — BN normalizes
            # by the fake batch's own statistics, so the G gradient flows
            # through batch-stat normalization (running averages never
            # enter train-mode BN output); the running-stat update from
            # this pass persists into d_vars, as in torch. (The GP pass's
            # stat update is still discarded — running averages never
            # affect training dynamics, only the stored D checkpoint.)
            # ALL non-param collections are mutable in train mode, so a
            # spectral-norm D's power iteration runs and persists here
            # too (torch iterates on every train-mode forward).
            fake_pred, new_state = self.net_d.apply(
                d_vars, output, train=True,
                mutable=self._d_state_keys(d_vars))
            new_dstate = dict(new_state)
            l_g_gan = gan_loss(fake_pred, True, self.gan_type,
                               loss_weight=self.gan_weight, is_disc=False)
            total += l_g_gan
            logs['l_g_gan'] = l_g_gan
        return total, logs, new_dstate

    def _g_losses(self, g_params, batch, pre_offset, ref_feat, d_vars,
                  perceptual_vars, with_gan):
        output = self.net_g.apply({'params': g_params}, batch['img_in_lq'],
                                  pre_offset, ref_feat)
        total, logs, dstate = self._out_losses(output, batch['img_in'],
                                               d_vars, perceptual_vars,
                                               with_gan)
        return total, (logs, output, dstate)

    @staticmethod
    def _d_state_keys(d_vars):
        """All non-param collections of net_d (batch_stats, and
        spectral_stats when the sn option is on) — the set that is
        mutable during train-mode D forwards and threaded through the
        step (torch mutates BN running stats and the spectral-norm u
        vector on every train-mode forward)."""
        return [k for k in d_vars if k != 'params']

    def _d_loss_fn(self, d_params, other, gt, fake, rng):
        """WGAN D loss (real/fake + gradient penalty,
        ref_restoration_model.py:209-232); shared by the fused and
        unfused D steps."""
        mutable = list(other)
        variables = dict(other, params=d_params)
        real_pred, new_state = self.net_d.apply(
            variables, gt, train=True, mutable=mutable)
        l_d_real = gan_loss(real_pred, True, self.gan_type, is_disc=True)
        fake_pred, new_state = self.net_d.apply(
            dict(new_state, params=d_params), fake, train=True,
            mutable=mutable)
        l_d_fake = gan_loss(fake_pred, False, self.gan_type, is_disc=True)
        l_d_total = l_d_real + l_d_fake
        logs = {'l_d_real': l_d_real, 'l_d_fake': l_d_fake,
                'out_d_real': jnp.mean(real_pred),
                'out_d_fake': jnp.mean(fake_pred)}
        if self.grad_penalty_weight > 0:
            def disc_fn(x):
                # train-mode BN (batch statistics), matching the
                # reference's D(interpolates) in train mode; stat
                # updates from this pass are discarded
                out, _ = self.net_d.apply(
                    dict(other, params=d_params), x, train=True,
                    mutable=mutable)
                return out

            l_gp = gradient_penalty_loss(
                disc_fn, gt, fake, rng,
                loss_weight=self.grad_penalty_weight)
            l_d_total += l_gp
            logs['l_grad_penalty'] = l_gp
        return l_d_total, (logs, dict(new_state))

    def _g_forward_with_stats(self, g_params, img_in_lq, pre_offset,
                              ref_feat, valid_shape=None):
        """G forward that also surfaces the sown DynAgg offset telemetry
        (the reference's exploding-offset warning source,
        dcn_v2.py:247-250). ``valid_shape``: valid LR sizes of a
        bucket-padded eval batch (None in training)."""
        output, aux = self.net_g.apply(
            {'params': g_params}, img_in_lq, pre_offset, ref_feat,
            valid_shape, mutable=['intermediates'])
        return output, self._offset_stats(aux['intermediates'])

    @staticmethod
    def _offset_stats(intermediates):
        """{'offset_absmean_<scale>': scalar} from sown intermediates."""
        agg = intermediates.get('dyn_agg_restore', {})
        out = {}
        for scale in ('small', 'medium', 'large'):
            node = agg.get(f'{scale}_dyn_agg', {})
            v = node.get('offset_absmean')
            if v is not None:
                out[f'offset_absmean_{scale}'] = (
                    v[0] if isinstance(v, (tuple, list)) else v)
        return out

    def _build_g_pretrain_step(self):

        def loss_fn(g_params, batch, pre_offset, ref_feat):
            output, stats = self._g_forward_with_stats(
                g_params, batch['img_in_lq'], pre_offset, ref_feat)
            return self.cri_pix(output, batch['img_in']), (output, stats)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(g_params, opt_state, extractor_vars, map_vars, batch):
            pre_offset, ref_feat = self._match_graph(
                extractor_vars, map_vars, batch['img_in_up'],
                batch['img_ref'])
            (l_pix, (output, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(g_params, batch, pre_offset,
                                       ref_feat)
            updates, opt_state = self.tx_g.update(grads, opt_state,
                                                  g_params)
            g_params = optax.apply_updates(g_params, updates)
            return g_params, opt_state, output, {'l_pix': l_pix, **stats}

        return step

    def _d_update(self, d_vars, opt_state, gt, fake, rng):
        """One discriminator update (traced; used by both step builders)."""
        d_params = d_vars['params']
        other = {k: v for k, v in d_vars.items() if k != 'params'}
        (l_d, (logs, dstate)), grads = jax.value_and_grad(
            self._d_loss_fn, has_aux=True)(d_params, other, gt, fake, rng)
        updates, opt_state = self.tx_d.update(grads, opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        new_vars = dict(other, params=d_params, **dstate)
        return new_vars, opt_state, logs

    def _build_d_step(self):

        @jax.jit
        def step(d_vars, opt_state, gt, fake, rng):
            return self._d_update(d_vars, opt_state, gt, fake, rng)

        return step

    def _build_g_step(self):

        @jax.jit
        def step(g_params, opt_state, batch, pre_offset, ref_feat, d_vars,
                 perceptual_vars):
            (l_g, (logs, output, dstate)), grads = jax.value_and_grad(
                self._g_losses, has_aux=True)(
                    g_params, batch, pre_offset, ref_feat, d_vars,
                    perceptual_vars, self.net_d is not None)
            updates, opt_state = self.tx_g.update(grads, opt_state,
                                                  g_params)
            g_params = optax.apply_updates(g_params, updates)
            if dstate:
                d_vars = dict(d_vars, **dstate)
            return g_params, opt_state, output, logs, d_vars

        return step

    def _build_gan_step(self):
        """The whole post-pretrain iteration as ONE donated jit (see
        module docstring): match -> single G forward (jax.vjp) ->
        D update -> G update with the updated D.

        ``do_g`` handling: configs with no D-only iterations (shipped
        production: net_d_steps=1, net_d_init_steps=0 — do_g is True at
        every step) take it as a STATIC argument, so exactly one
        executable compiles and the G phase has no branch around it.
        Configs WITH D-only iterations (net_d_steps>1 or
        net_d_init_steps>0) would compile two full multi-minute
        variants under the static scheme; for those, do_g becomes a
        TRACED boolean and the G phase sits under ``lax.cond`` — one
        compile, and XLA executes only the taken branch at runtime
        (the skip branch is the identity on params/opt state and
        returns zeroed G-loss logs, which ``optimize_parameters`` drops
        from ``log_dict`` to match the reference's D-only logging,
        ref_restoration_model.py:241-269)."""
        with_d = self.net_d is not None
        self._dynamic_do_g = (self.net_d_steps > 1
                              or self.net_d_init_steps > 0)
        self._g_log_keys = ()

        def iteration(g_params, opt_g, d_vars, opt_d, extractor_vars,
                      map_vars, batch, perceptual_vars, rng, do_g):
            pre_offset, ref_feat = self._match_graph(
                extractor_vars, map_vars, batch['img_in_up'],
                batch['img_ref'])

            def fwd(p):
                return self._g_forward_with_stats(
                    p, batch['img_in_lq'], pre_offset, ref_feat)

            # remat the G forward: holding its residuals across the D
            # grad-of-grad update OOMs a 16G chip at batch 9/160px; the
            # backward recomputes them instead (the reference pays the
            # same second forward by retaining one autograd graph).
            # Exception: the gathered DCN rows are saved (the gathers are
            # the expensive part of the forward; everything else is
            # cheap to recompute). ``train.remat_policy`` overrides:
            # 'dcn_rows' (default), 'dots' (also save matmul/conv
            # outputs — more HBM), 'none' (no remat at all — fastest
            # when it fits).
            remat_policy = (self.opt['train'].get('remat_policy')
                            or 'dcn_rows')
            if remat_policy == 'none':
                remat_fwd = fwd
            elif remat_policy == 'dots':
                remat_fwd = jax.checkpoint(
                    fwd,
                    policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable)
            else:
                remat_fwd = jax.checkpoint(
                    fwd,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        'dcn_rows'))
            (output, stats), g_vjp = jax.vjp(remat_fwd, g_params)
            fake = jax.lax.stop_gradient(output)

            logs = dict(stats)
            if with_d:
                d_vars, opt_d, d_logs = self._d_update(
                    d_vars, opt_d, batch['img_in'], fake, rng)
                logs.update(d_logs)

            def out_loss(out):
                total, g_logs, dstate = self._out_losses(
                    out, batch['img_in'], d_vars, perceptual_vars,
                    with_d)
                return total, (g_logs, dstate)

            def g_phase(operand):
                g_params, opt_g, d_vars = operand
                (l_g, (g_logs, dstate)), dout = jax.value_and_grad(
                    out_loss, has_aux=True)(output)
                grads_g = g_vjp(
                    (dout, jax.tree.map(jnp.zeros_like, stats)))[0]
                updates, new_opt_g = self.tx_g.update(grads_g, opt_g,
                                                      g_params)
                g_params = optax.apply_updates(g_params, updates)
                if dstate:
                    d_vars = dict(d_vars, **dstate)
                return g_params, new_opt_g, d_vars, g_logs

            if isinstance(do_g, bool):                 # static variant
                if do_g:
                    g_params, opt_g, d_vars, g_logs = g_phase(
                        (g_params, opt_g, d_vars))
                    logs.update(g_logs)
                else:
                    # unreachable in production (static build requires
                    # no D-only iterations) but kept consistent with the
                    # traced skip branch: G's scheduler still advances
                    opt_g = shift_schedule_count(opt_g, 1)
            else:                                      # traced variant
                # zero G-logs of the exact structure the G branch
                # produces (key set is config-static); eval_shape traces
                # abstractly, no compute
                _, (logs_shape, _) = jax.eval_shape(out_loss, output)
                zero_logs = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), logs_shape)
                self._g_log_keys = tuple(zero_logs)

                def skip_g(operand):
                    g_params, opt_g, d_vars = operand
                    # D-only iteration: the reference still steps G's
                    # scheduler (milestones are absolute iterations) —
                    # advance the schedule count without an Adam update
                    return (g_params, shift_schedule_count(opt_g, 1),
                            d_vars, zero_logs)

                g_params, opt_g, d_vars, g_logs = jax.lax.cond(
                    do_g, g_phase, skip_g, (g_params, opt_g, d_vars))
                logs.update(g_logs)

            return g_params, opt_g, d_vars, opt_d, fake, logs

        if self._dynamic_do_g:
            step_dyn = jax.jit(iteration, donate_argnums=(0, 1, 2, 3))

            def step(g_params, opt_g, d_vars, opt_d, extractor_vars,
                     map_vars, batch, perceptual_vars, rng, *, do_g):
                return step_dyn(g_params, opt_g, d_vars, opt_d,
                                extractor_vars, map_vars, batch,
                                perceptual_vars, rng,
                                jnp.asarray(do_g, jnp.bool_))

            step._inner_jit = step_dyn       # introspection (tests)
            return step

        @functools.partial(jax.jit, static_argnames=('do_g',),
                           donate_argnums=(0, 1, 2, 3))
        def step(g_params, opt_g, d_vars, opt_d, extractor_vars, map_vars,
                 batch, perceptual_vars, rng, *, do_g):
            return iteration(g_params, opt_g, d_vars, opt_d,
                             extractor_vars, map_vars, batch,
                             perceptual_vars, rng, do_g)

        return step

    # ----------------------------------------------------------------- API
    _EVAL_BUCKET = 16  # LR-space bucket multiple (64 px in HR space)

    def feed_data(self, batch):
        arrays = {
            'img_in_lq': batch['img_in_lq'],
            'img_ref': batch['img_ref'],
            'img_in': batch['img_in'],
            'img_in_up': batch['img_in_up'],
        }
        self._eval_crop = None
        self._valid_lr = None
        if not self.is_train:
            # bucket-pad eval shapes so XLA compiles once per bucket, not
            # once per image (static-shape discipline, SURVEY.md §7);
            # output is cropped back in _validation_images. The valid
            # (pre-pad) sizes ride into test() as traced scalars so the
            # networks can mask the pad bands — the valid crop then
            # equals the exact-shape run bit-for-bit up to reassociation
            # (bucket-padding invariance; tests/test_eval_padding.py).
            lq = arrays['img_in_lq']
            b_lr = self._EVAL_BUCKET
            h, w = lq.shape[1:3]
            ph = (-h) % b_lr
            pw = (-w) % b_lr
            if ph or pw:
                def pad_to(x, mult):
                    hh, ww = x.shape[1:3]
                    return np.pad(x, ((0, 0), (0, (-hh) % mult),
                                      (0, (-ww) % mult), (0, 0)))

                arrays['img_in_lq'] = pad_to(lq, b_lr)
                arrays['img_ref'] = pad_to(arrays['img_ref'], 4 * b_lr)
                arrays['img_in_up'] = pad_to(arrays['img_in_up'], 4 * b_lr)
                self._eval_crop = (4 * h, 4 * w)
                self._valid_lr = (h, w)
        # val_spatial_shard: batch-1 eval on a multi-device mesh splits
        # each image into horizontal bands across devices (XLA inserts
        # the halos/collectives) instead of replicating the whole
        # computation on every device
        spatial = bool(not self.is_train
                       and self.opt.get('val_spatial_shard'))
        self.batch = self.shard_batch(arrays, spatial=spatial)
        self.meta = {k: batch[k] for k in ('padding', 'original_size',
                                           'lq_path') if k in batch}

    def optimize_parameters(self, step):
        if step <= self.net_g_pretrain_steps:
            params, self.opt_state_g, self.output, logs = \
                self._g_pretrain_step(self.vars_g['params'],
                                      self.opt_state_g,
                                      self.vars_extractor, self.vars_map,
                                      self.batch)
            self.vars_g = dict(self.vars_g, params=params)
            self.log_dict = logs
            return

        do_g = ((step - self.net_g_pretrain_steps) % self.net_d_steps == 0
                and (step - self.net_g_pretrain_steps)
                > self.net_d_init_steps)
        self._rng, sub = jax.random.split(self._rng)
        (params, self.opt_state_g, d_vars, opt_d, self.output,
         self.log_dict) = self._gan_step(
            self.vars_g['params'], self.opt_state_g,
            self.vars_d if self.net_d else {},
            self.opt_state_d if self.net_d else (),
            self.vars_extractor, self.vars_map, self.batch,
            self.vars_perceptual, sub, do_g=bool(do_g))
        self.vars_g = dict(self.vars_g, params=params)
        if self.net_d:
            self.vars_d = d_vars
            self.opt_state_d = opt_d
        if getattr(self, '_dynamic_do_g', False) and not do_g:
            # D-only iteration under the traced-do_g step: the cond's
            # skip branch returns zeroed G-loss logs for structural
            # parity — drop them, matching the reference's D-only
            # logging (ref_restoration_model.py:241-269)
            self.log_dict = {k: v for k, v in self.log_dict.items()
                             if k not in self._g_log_keys}

    def test(self):
        vs_lr = getattr(self, '_valid_lr', None)
        vs_hr = None
        if vs_lr is not None:
            # plain-int leaves: traced by jit (no recompile per valid
            # size within a bucket), masked comparisons on device
            vs_lr = (int(vs_lr[0]), int(vs_lr[1]))
            vs_hr = (4 * vs_lr[0], 4 * vs_lr[1])
        pre_offset, ref_feat = self._match(
            self.vars_extractor, self.vars_map, self.batch['img_in_up'],
            self.batch['img_ref'], vs_hr)
        self.output, stats = self._forward(self.vars_g['params'],
                                           self.batch['img_in_lq'],
                                           pre_offset, ref_feat, vs_lr)
        # exploding-offset detection in eval forwards too (the reference
        # warns in every DCN forward, dcn_v2.py:247-250); fetched here,
        # after the output fetch, so it adds no extra sync point
        self._offset_warn_stats = stats

    # validation = SRModel._validation_loop with the 3-metric protocol
    # (ref_restoration_model.py:295-370) and per-image logging
    _VAL_METRIC_LABELS = {'psnr': 'PSNR', 'psnr_y': 'PSNR_Y',
                          'ssim_y': 'SSIM_Y'}
    _VAL_LOG_PER_IMAGE = True

    def _compute_val_metrics(self, sr_img, gt_img):
        crop = self.opt['crop_border']
        sr_y = metrics.bgr2ycbcr(sr_img / 255., only_y=True) * 255
        gt_y = metrics.bgr2ycbcr(gt_img / 255., only_y=True) * 255
        return {
            'psnr': metrics.psnr(sr_img, gt_img, crop_border=crop),
            'psnr_y': metrics.psnr(sr_y, gt_y, crop_border=crop),
            'ssim_y': metrics.ssim(sr_y, gt_y, crop_border=crop),
        }

    def _validation_images(self, val_data):
        self.feed_data(val_data)
        self.test()
        output = np.asarray(jax.device_get(self.output))
        for v in getattr(self, '_offset_warn_stats', {}).values():
            v = float(v)
            if v > 100:
                logger.warning(f'Offset mean is {v}, larger than 100.')
        if self._eval_crop is not None:
            output = output[:, :self._eval_crop[0], :self._eval_crop[1]]
        sr_img = tensor2img(output)
        gt_img = tensor2img(np.asarray(val_data['img_in']))
        padding = val_data.get('padding')
        if padding is not None:
            pad = bool(np.asarray(padding).reshape(-1)[0])
            if pad:
                orig = val_data['original_size']
                if isinstance(orig, list):
                    orig = orig[0]
                sr_img = sr_img[:int(orig[0]), :int(orig[1])]
                gt_img = gt_img[:int(orig[0]), :int(orig[1])]
        return sr_img, gt_img

    def save(self, epoch, current_iter):
        self.save_network(self.vars_g, 'net_g', current_iter)
        if self.net_d:
            self.save_network(self.vars_d, 'net_d', current_iter)
        state = {'opt_g': self.opt_state_g}
        if self.net_d:
            state['opt_d'] = self.opt_state_d
        self.save_training_state(epoch, current_iter, state)

    def resume_training(self, state_path):
        template = {'opt_g': self.opt_state_g}
        if self.net_d:
            template['opt_d'] = self.opt_state_d
        epoch, it, state = self.load_training_state(state_path, template)
        self.opt_state_g = self.replicate(state['opt_g'])
        if self.net_d:
            self.opt_state_d = self.replicate(state['opt_d'])
        return epoch, it
