#!/usr/bin/env python
"""Test entry point — CLI-compatible with the reference:

    python mmsr/test.py -opt options/test/<config>.yml

Parity target: mmsr/test.py (:13-66): builds one loader per sorted
``test_*`` dataset block and runs model.validation on each.
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
import os.path as osp
import sys
import time

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), osp.pardir)))

from c2matching_tpu.data import create_dataloader, create_dataset
from c2matching_tpu.models import create_model
from c2matching_tpu.utils import (dict2str, dict_to_nonedict,
                                  get_root_logger, make_exp_dirs)
from c2matching_tpu.utils.compile_cache import enable_persistent_cache
from c2matching_tpu.utils.options import parse

# eval-bucket compiles are minutes through the remote-compile tunnel;
# the persistent cache makes them a one-time cost per bucket shape
enable_persistent_cache()


def get_time_str():
    return time.strftime('%Y%m%d_%H%M%S', time.localtime())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to option YAML file.')
    args = parser.parse_args()
    opt = parse(args.opt, is_train=False)

    make_exp_dirs(opt)
    log_file = osp.join(opt['path']['log'],
                        f"test_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(logger_name='base', log_level=logging.INFO,
                             log_file=log_file)
    logger.info(dict2str(opt))

    opt = dict_to_nonedict(opt)

    test_loaders = []
    for phase, dataset_opt in sorted(opt['datasets'].items()):
        test_set = create_dataset(dataset_opt)
        test_loader = create_dataloader(test_set, dataset_opt)
        logger.info(f"Number of test images in {dataset_opt['name']}: "
                    f'{len(test_set)}')
        test_loaders.append(test_loader)

    model = create_model(opt)

    for test_loader in test_loaders:
        test_set_name = test_loader.dataset.opt['name']
        logger.info(f'Testing {test_set_name}...')
        model.validation(test_loader, current_iter=opt['name'],
                        tb_logger=None, save_img=opt['save_img'])


if __name__ == '__main__':
    main()
