"""Stage-1 model: teacher contrastive correspondence network.

Parity target: mmsr/models/teacher_contras_model.py (:67-277). The torch
feed_data/backward/step flow becomes one jitted train-step function
(params, opt_state, batch) -> (params, opt_state, logs) with the
vectorized triplet loss (contras_losses.py).
"""
import logging
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import ProgressBar
from ..utils.registry import MODEL_REGISTRY
from . import networks
from .base_model import BaseModel, make_adam
from .contras_losses import triplet_loss_batch

logger = logging.getLogger('base')


@MODEL_REGISTRY.register
class TeacherContrasModel(BaseModel):

    net_role = 'g'

    def __init__(self, opt):
        super().__init__(opt)
        self.net_g = networks.define_net_g(opt)

        rng = jax.random.PRNGKey(opt.get('manual_seed') or 0)
        gt = opt['datasets'].get('train', {}).get('gt_size', 160) \
            if opt.get('datasets') else 160
        dummy = jnp.zeros((1, gt, gt, 3))
        self.vars_g = jax.jit(self.net_g.init)(rng, dummy, dummy)

        load_path = self.opt['path'].get('pretrain_model_g')
        if load_path:
            loaded = self.load_network(load_path, 'extractor')
            self.vars_g = self.merge_loaded(self.vars_g, loaded)
        self.vars_g = self.replicate(self.vars_g)
        self.print_network(self.net_g, self.vars_g)

        if self.is_train:
            self.init_training_settings()

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.margin = train_opt['margin']
        self.safe_radius = train_opt['safe_radius']
        self.scaling_steps = train_opt['scaling_steps']
        self.tx = make_adam(train_opt['lr_g'],
                            schedule_fn=self.schedule_fn)
        self.opt_state = self.replicate(self.tx.init(self.vars_g['params']))
        self._train_step = self._build_train_step()
        self._eval_loss = self._build_eval_loss()
        self.log_dict = {}

    def base_lrs(self):
        return [self.opt['train']['lr_g']]

    # -------------------------------------------------------------- steps
    def _loss_fn(self, params, batch):
        out = self.net_g.apply({'params': params}, batch['img_in'],
                               batch['img_ref'])
        loss, pos, neg, n_ok = triplet_loss_batch(
            out['dense_features1'], out['dense_features2'],
            batch['transformed_coordinate'], margin=self.margin,
            safe_radius=self.safe_radius, scaling_steps=self.scaling_steps)
        return loss, (pos, neg, n_ok)

    def _build_train_step(self):

        @jax.jit
        def step(params, opt_state, batch):
            (loss, (pos, neg, n_ok)), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            logs = {'loss': loss, 'pos_dist': pos, 'neg_dist': neg,
                    'n_valid': n_ok}
            return params, opt_state, logs

        return step

    def _build_eval_loss(self):

        @jax.jit
        def eval_loss(params, batch):
            loss, (pos, neg, n_ok) = self._loss_fn(params, batch)
            return {'loss': loss, 'pos_dist': pos, 'neg_dist': neg}

        return eval_loss

    # ---------------------------------------------------------------- API
    def feed_data(self, batch):
        self.batch = self.shard_batch({
            'img_in': batch['img_in'],
            'img_ref': batch['img_ref'],
            'transformed_coordinate':
                batch['transformed_coordinate'].astype(np.float32),
        })

    def optimize_parameters(self, step):
        params, self.opt_state, logs = self._train_step(
            self.vars_g['params'], self.opt_state, self.batch)
        self.vars_g = dict(self.vars_g, params=params)
        # keep device arrays; MessageLogger converts at print time
        self.log_dict = logs

    def test(self):
        self._last_eval = self._eval_loss(self.vars_g['params'], self.batch)

    def dist_validation(self, *args, **kwargs):
        logger.info('Only support single GPU validation.')
        self.nondist_validation(*args, **kwargs)

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img=False):
        pbar = ProgressBar(len(dataloader))
        totals = {'loss': 0., 'pos_dist': 0., 'neg_dist': 0.}
        count = 0
        dataset_name = dataloader.dataset.opt['name']
        for val_data in dataloader:
            img_name = osp.splitext(osp.basename(val_data['name'][0]))[0]
            self.feed_data(val_data)
            self.test()
            for k in totals:
                totals[k] += float(self._last_eval[k])
            count += 1
            pbar.update(f'Test {img_name}')
        for k in totals:
            totals[k] /= max(count, 1)
        logger.info(
            f"# Validation {dataset_name} # loss_val: {totals['loss']:.4e} "
            f"# positive_distance: {totals['pos_dist']:.4e} "
            f"# negative_distance: {totals['neg_dist']:.4e}.")
        if tb_logger:
            tb_logger.add_scalar('loss_val', totals['loss'], current_iter)

    def save(self, epoch, current_iter):
        self.save_network(self.vars_g, 'net_g', current_iter)
        self.save_training_state(epoch, current_iter,
                                 {'opt_g': self.opt_state})

    def resume_training(self, state_path):
        epoch, it, state = self.load_training_state(
            state_path, {'opt_g': self.opt_state})
        self.opt_state = self.replicate(state['opt_g'])
        return epoch, it
