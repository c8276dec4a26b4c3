"""Dataset / dataloader factories.

Parity target: mmsr/data/__init__.py (create_dataset :25-41,
create_dataloader :44-93): registry dispatch by YAML ``type``; train
loaders divide batch/workers by the process count under multi-host
execution; val/test loaders are batch-1 single-worker.
"""
import logging

from ..utils.registry import DATASET_REGISTRY
from .contras_dataset import ContrasDataset, ContrasValDataset  # noqa: F401
from .data_sampler import EnlargedIterSampler
from .loader import DataLoader
from .ref_cufed_dataset import RefCUFEDDataset  # noqa: F401

logger = logging.getLogger('base')


def create_dataset(dataset_opt):
    """Instantiate a dataset from its YAML block (``type`` key)."""
    dataset = DATASET_REGISTRY.get(dataset_opt['type'])(dataset_opt)
    logger.info(
        f"Dataset {dataset.__class__.__name__} - {dataset_opt['name']} "
        'is created.')
    return dataset


def create_dataloader(dataset, dataset_opt, num_processes=1, rank=0,
                      sampler=None, seed=0):
    """Build a loader per the reference's phase rules
    (mmsr/data/__init__.py:44-93)."""
    phase = dataset_opt['phase']
    if phase == 'train':
        batch_size = dataset_opt['batch_size'] // num_processes
        if batch_size < 1:
            raise ValueError(
                f"batch_size {dataset_opt['batch_size']} < "
                f'{num_processes} processes: the per-process batch '
                f'would be 0 (torch DataLoader rejects this too)')
        num_workers = dataset_opt.get('n_workers', 1) or 1
        shuffle = dataset_opt.get('use_shuffle', True)
        if sampler is not None:
            shuffle = False
        return DataLoader(dataset, batch_size=batch_size, sampler=sampler,
                          shuffle=shuffle, num_workers=num_workers,
                          drop_last=True, seed=seed)
    elif phase in ('val', 'test'):
        return DataLoader(dataset, batch_size=1, shuffle=False,
                          num_workers=1)
    raise ValueError(f'Wrong dataset phase: {phase}.')


def create_train_sampler(dataset, dataset_opt, num_processes=1, rank=0):
    """EnlargedIterSampler when running multi-process (the DistIterSampler
    analog, train.py:93-98)."""
    # reference default is 1 (train.py:87) — must agree with the epoch
    # math in mmsr/train.py, which also defaults the ratio to 1
    ratio = dataset_opt.get('dataset_enlarge_ratio', 1) or 1
    return EnlargedIterSampler(len(dataset), num_replicas=num_processes,
                               rank=rank, ratio=ratio)


__all__ = [
    'create_dataset', 'create_dataloader', 'create_train_sampler',
    'DataLoader', 'EnlargedIterSampler', 'RefCUFEDDataset', 'ContrasDataset',
    'ContrasValDataset',
]
