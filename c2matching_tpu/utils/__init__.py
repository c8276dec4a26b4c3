from .logger import MessageLogger, get_root_logger, init_tb_logger
from .metrics import bgr2ycbcr, psnr, ssim
from .options import NoneDict, dict2str, dict_to_nonedict, parse
from .registry import (ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY,
                       MODEL_REGISTRY, Registry)
from .util import (ProgressBar, check_resume, imfrombytes, impad, imwrite,
                   make_exp_dirs, mkdir_and_rename, tensor2img)

__all__ = [
    'MessageLogger', 'get_root_logger', 'init_tb_logger', 'bgr2ycbcr', 'psnr',
    'ssim', 'NoneDict', 'dict2str', 'dict_to_nonedict', 'parse',
    'ARCH_REGISTRY', 'DATASET_REGISTRY', 'LOSS_REGISTRY', 'MODEL_REGISTRY',
    'Registry', 'ProgressBar', 'check_resume', 'imfrombytes', 'impad',
    'imwrite', 'make_exp_dirs', 'mkdir_and_rename', 'tensor2img',
]
