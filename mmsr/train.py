#!/usr/bin/env python
"""Training entry point — CLI-compatible with the reference:

    python mmsr/train.py -opt options/train/<config>.yml [--launcher ...]

Parity target: mmsr/train.py (:20-189). The --launcher flag is accepted
for compatibility but multi-host execution is environment-driven
(jax.distributed); see c2matching_tpu.parallel.
"""
import os

# platform override BEFORE any backend init: some environments pin a
# default jax platform at interpreter start (sitecustomize), where the
# JAX_PLATFORMS env var alone is too late; jax.config still works here.
# e.g. C2MATCHING_PLATFORM=cpu runs this CLI on CPU (tests/CI).
if os.environ.get('C2MATCHING_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['C2MATCHING_PLATFORM'])

import argparse
import logging
import math
import os.path as osp
import random
import sys
import time

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), osp.pardir)))

from c2matching_tpu.data import (create_dataloader, create_dataset,
                                 create_train_sampler)
from c2matching_tpu.models import create_model
from c2matching_tpu.parallel import init_distributed
from c2matching_tpu.utils import (MessageLogger, dict2str, dict_to_nonedict,
                                  get_root_logger, init_tb_logger,
                                  make_exp_dirs)
from c2matching_tpu.utils.compile_cache import enable_persistent_cache
from c2matching_tpu.utils.options import parse
from c2matching_tpu.utils.util import check_resume

# the fused train-step compiles are minutes through the remote-compile
# tunnel; the persistent cache makes them a one-time cost per config
enable_persistent_cache()


def get_time_str():
    return time.strftime('%Y%m%d_%H%M%S', time.localtime())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to option YAML file.')
    parser.add_argument('--launcher', choices=['none', 'pytorch', 'slurm'],
                        default='none',
                        help='accepted for reference CLI compatibility; '
                             'multi-host init is environment-driven')
    parser.add_argument('--local_rank', type=int, default=0)
    args = parser.parse_args()
    opt = parse(args.opt, is_train=True)

    rank, world_size = init_distributed(opt)
    opt['dist'] = world_size > 1
    opt['rank'], opt['world_size'] = rank, world_size

    # resume state path (train.py:48-53)
    resume_state_path = opt['path'].get('resume_state')
    if resume_state_path:
        check_resume(opt, osp.splitext(osp.basename(resume_state_path))[0])

    if resume_state_path is None and rank == 0:
        make_exp_dirs(opt)
    log_file = osp.join(opt['path']['log'],
                        f"train_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(logger_name='base', log_level=logging.INFO,
                             log_file=log_file)
    logger.info(dict2str(opt))
    tb_logger = None
    if opt.get('use_tb_logger') and 'debug' not in opt['name'] and rank == 0:
        tb_logger = init_tb_logger(
            log_dir=osp.join(opt['path']['root'], 'tb_logger', opt['name']))

    opt = dict_to_nonedict(opt)

    seed = opt['train']['manual_seed']
    if seed is None:
        seed = random.randint(1, 10000)
    logger.info(f'Random seed: {seed}')
    random.seed(seed)
    import numpy as np
    np.random.seed(seed)

    # dataloaders (train.py:83-116)
    train_loader = val_loader = None
    train_sampler = None
    for phase, dataset_opt in opt['datasets'].items():
        if phase == 'train':
            train_set = create_dataset(dataset_opt)
            train_size = int(
                math.ceil(len(train_set) / dataset_opt['batch_size']))
            total_iters = int(opt['train']['niter'])
            total_epochs = int(math.ceil(total_iters / train_size))
            enlarge = dataset_opt.get('dataset_enlarge_ratio', 1) or 1
            if opt['dist'] or enlarge > 1:
                train_sampler = create_train_sampler(
                    train_set, dataset_opt, world_size, rank)
                total_epochs = int(
                    math.ceil(total_iters / (train_size * enlarge)))
            train_loader = create_dataloader(
                train_set, dataset_opt, world_size, rank, train_sampler,
                seed=seed)
            logger.info(f'Number of train images: {len(train_set)}, '
                        f'iters: {train_size}')
            logger.info(f'Total epochs needed: {total_epochs} for iters '
                        f'{total_iters}')
        elif phase == 'val':
            val_set = create_dataset(dataset_opt)
            val_loader = create_dataloader(val_set, dataset_opt)
            logger.info(
                f"Number of val images/folders in {dataset_opt['name']}: "
                f'{len(val_set)}')
        else:
            raise NotImplementedError(f'Phase {phase} is not recognized.')
    assert train_loader is not None

    model = create_model(opt)

    if resume_state_path:
        start_epoch, current_iter = model.resume_training(resume_state_path)
        logger.info(f'Resuming training from epoch: {start_epoch}, '
                    f'iter: {current_iter}.')
    else:
        current_iter = 0
        start_epoch = 0

    msg_logger = MessageLogger(opt, current_iter, tb_logger)
    logger.info(
        f'Start training from epoch: {start_epoch}, iter: {current_iter}')

    # preemption-aware checkpointing (beyond the reference, which only
    # supports cold resume): SIGTERM/SIGINT save a resumable state first
    import signal
    preempted = {'flag': False}

    def _on_signal(signum, frame):
        preempted['flag'] = True
        logger.warning(f'signal {signum} received; checkpointing before '
                       'exit')

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    # optional device tracing: logger.trace_dir enables jax.profiler for
    # iterations [trace_start_iter, trace_start_iter + trace_n_iters)
    trace_dir = opt['logger'].get('trace_dir') if opt['logger'] else None
    trace_start = -1
    trace_n = 0
    tracing = {'on': False}
    if trace_dir:
        trace_start = opt['logger'].get('trace_start_iter')
        # clamp to >=1: current_iter starts at 1, so a configured 0
        # would otherwise never match and the trace silently never runs
        trace_start = max(1, 10 if trace_start is None
                          else int(trace_start))
        trace_n = opt['logger'].get('trace_n_iters')
        trace_n = 5 if trace_n is None else int(trace_n)

    def _stop_trace():
        # also called at loop exit so a trace overlapping the end of
        # training is finalized rather than left unreadable
        if tracing['on']:
            import jax
            jax.profiler.stop_trace()
            tracing['on'] = False
            logger.info(f'profiler trace written to {trace_dir}')

    data_time, iter_time = time.time(), time.time()

    for epoch in range(start_epoch, total_epochs + 1):
        # always re-seed the epoch: the plain-shuffle path (no sampler)
        # must reshuffle per epoch like the torch DataLoader, not replay
        # the epoch-0 permutation
        train_loader.set_epoch(epoch)
        for train_data in train_loader:
            data_time = time.time() - data_time

            current_iter += 1
            if current_iter > total_iters:
                break
            if preempted['flag']:
                # signal landed between iterations: save NOW instead of
                # paying for one more step first (a first-compile there
                # can cost minutes — longer than a preemption grace
                # window). current_iter-1 is the last completed step.
                logger.info('Saving models and training states '
                            '(preemption).')
                _stop_trace()
                model.save(epoch, current_iter - 1)
                return
            if trace_dir and trace_n > 0 and current_iter == trace_start:
                import jax
                jax.profiler.start_trace(trace_dir)
                tracing['on'] = True
            model.feed_data(train_data)
            model.optimize_parameters(current_iter)
            # traced iterations are [trace_start, trace_start + trace_n):
            # this check runs post-optimize, so stop once the last
            # in-window iteration (trace_start + trace_n - 1) has run
            if tracing['on'] and current_iter >= trace_start + trace_n - 1:
                _stop_trace()
            iter_time = time.time() - iter_time

            if preempted['flag']:
                logger.info('Saving models and training states '
                            '(preemption).')
                _stop_trace()
                model.save(epoch, current_iter)
                return

            if current_iter % opt['logger']['print_freq'] == 0:
                log_vars = {'epoch': epoch, 'iter': current_iter,
                            'lrs': model.current_learning_rates(
                                current_iter)}
                log_vars.update({'time': iter_time,
                                 'data_time': data_time})
                log_vars.update(model.log_dict)
                msg_logger(log_vars)

            if (val_loader is not None
                    and current_iter % opt['val']['val_freq'] == 0):
                model.validation(val_loader, current_iter, tb_logger,
                                 opt['val']['save_img'])

            if current_iter % opt['logger']['save_checkpoint_freq'] == 0:
                logger.info('Saving models and training states.')
                model.save(epoch, current_iter)

            data_time = time.time()
            iter_time = time.time()
        if current_iter > total_iters:
            break

    _stop_trace()
    logger.info('End of training.')
    logger.info('Saving the latest model.')
    model.save(epoch=-1, current_iter=-1)
    if tb_logger:
        tb_logger.close()


if __name__ == '__main__':
    main()
