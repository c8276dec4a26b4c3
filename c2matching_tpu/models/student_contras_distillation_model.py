"""Stage-2 model: student contrastive network with teacher distillation.

Parity target: mmsr/models/student_contras_distillation_model.py (:67-334).
Student runs on (bicubic-upsampled LR, HR ref); the frozen teacher on
(HR GT, HR ref); loss = triplet + distill_weight * KL over
temperature-scaled correlation rows (contras_losses.py). One jitted train
step; teacher params are closed over as frozen constants.
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
from .contras_losses import distillation_loss_batch

logger = logging.getLogger('base')


@MODEL_REGISTRY.register
class StudentContrasDistillationModel(BaseModel):

    def __init__(self, opt):
        super().__init__(opt)
        self.net_student = networks.define_net_student(opt)
        self.net_teacher = networks.define_net_teacher(opt)

        rng = jax.random.PRNGKey(opt.get('manual_seed') or 0)
        dummy = jnp.zeros((1, 160, 160, 3))
        self.vars_student = jax.jit(self.net_student.init)(rng, dummy,
                                                            dummy)
        self.vars_teacher = jax.jit(self.net_teacher.init)(
            jax.random.PRNGKey(1), dummy, dummy)

        load_path = self.opt['path'].get('pretrain_model_student')
        if load_path:
            self.vars_student = self.merge_loaded(
                self.vars_student, self.load_network(load_path, 'student'))
        load_path = self.opt['path'].get('pretrain_model_teacher')
        if load_path:
            self.vars_teacher = self.merge_loaded(
                self.vars_teacher, self.load_network(load_path, 'teacher'))

        self.vars_student = self.replicate(self.vars_student)
        self.vars_teacher = self.replicate(self.vars_teacher)
        self.print_network(self.net_student, self.vars_student)
        self.print_network(self.net_teacher, self.vars_teacher)

        if self.is_train:
            self.init_training_settings()

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.margin = train_opt['margin']
        self.safe_radius = train_opt['safe_radius']
        self.scaling_steps = train_opt['scaling_steps']
        self.distill_weight = train_opt['distill_weight']
        self.temperature = train_opt['temperature']
        self.tx = make_adam(train_opt['lr_g'], schedule_fn=self.schedule_fn)
        self.opt_state = self.replicate(
            self.tx.init(self.vars_student['params']))
        self._train_step = self._build_train_step()
        self._eval_loss = self._build_eval_loss()
        self.log_dict = {}

    def base_lrs(self):
        return [self.opt['train']['lr_g']]

    def _loss_fn(self, params, teacher_params, batch):
        s_out = self.net_student.apply({'params': params},
                                       batch['img_in_up'],
                                       batch['img_ref'])
        t_out = self.net_teacher.apply(
            {'params': teacher_params}, batch['img_in'], batch['img_ref'])
        t_out = jax.tree.map(jax.lax.stop_gradient, t_out)
        loss, pos, neg, distill, n_ok = distillation_loss_batch(
            s_out['dense_features1'], s_out['dense_features2'],
            t_out['dense_features1'], t_out['dense_features2'],
            batch['transformed_coordinate'], margin=self.margin,
            safe_radius=self.safe_radius, scaling_steps=self.scaling_steps,
            temperature=self.temperature,
            distill_weight=self.distill_weight)
        return loss, (pos, neg, distill, n_ok)

    def _build_train_step(self):

        @jax.jit
        def step(params, teacher_params, opt_state, batch):
            (loss, (pos, neg, distill, n_ok)), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(params, teacher_params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            logs = {'loss': loss, 'pos_dist': pos, 'neg_dist': neg,
                    'distill_loss': distill, 'n_valid': n_ok}
            return params, opt_state, logs

        return step

    def _build_eval_loss(self):

        @jax.jit
        def eval_loss(params, teacher_params, batch):
            loss, (pos, neg, distill, _n) = self._loss_fn(
                params, teacher_params, batch)
            return {'loss': loss, 'pos_dist': pos, 'neg_dist': neg,
                    'distill_loss': distill}

        return eval_loss

    def feed_data(self, batch):
        self.batch = self.shard_batch({
            'img_in': batch['img_in'],
            'img_in_up': batch['img_in_up'],
            'img_ref': batch['img_ref'],
            'transformed_coordinate':
                batch['transformed_coordinate'].astype(np.float32),
        })

    def optimize_parameters(self, step):
        params, self.opt_state, logs = self._train_step(
            self.vars_student['params'], self.vars_teacher['params'],
            self.opt_state, self.batch)
        self.vars_student = dict(self.vars_student, params=params)
        # keep device arrays; MessageLogger converts at print time
        self.log_dict = logs

    def test(self):
        self._last_eval = self._eval_loss(self.vars_student['params'],
                                          self.vars_teacher['params'],
                                          self.batch)

    def dist_validation(self, *args, **kwargs):
        logger.info('Only support single GPU validation.')
        self.nondist_validation(*args, **kwargs)

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img=False):
        pbar = ProgressBar(len(dataloader))
        totals = {'loss': 0., 'pos_dist': 0., 'neg_dist': 0.,
                  'distill_loss': 0.}
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
            f"# negative_distance: {totals['neg_dist']:.4e} "
            f"# distill_loss: {totals['distill_loss']:.4e}.")
        if tb_logger:
            tb_logger.add_scalar('loss_val', totals['loss'], current_iter)

    def save(self, epoch, current_iter):
        self.save_network(self.vars_student, 'net_student', current_iter)
        self.save_training_state(epoch, current_iter,
                                 {'opt_g': self.opt_state})

    def resume_training(self, state_path):
        epoch, it, state = self.load_training_state(
            state_path, {'opt_g': self.opt_state})
        self.opt_state = self.replicate(state['opt_g'])
        return epoch, it
