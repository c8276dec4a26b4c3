"""Iteration-oriented distributed sampler.

Parity target: mmsr/data/data_sampler.py DistIterSampler (:8-69): dataset
enlarged by ``ratio``, epoch-seeded random permutation, modulo into the
dataset, process-strided subsampling. torch.distributed rank/world map to
jax.process_index()/process_count().
"""
import math

import numpy as np


class EnlargedIterSampler:
    """Epoch-seeded, ratio-enlarged, process-strided index sampler."""

    def __init__(self, dataset_size, num_replicas=1, rank=0, ratio=100):
        self.dataset_size = dataset_size
        self.num_replicas = num_replicas
        self.rank = rank
        assert 0 <= rank < num_replicas
        self.epoch = 0
        self.num_samples = int(
            math.ceil(dataset_size * ratio / self.num_replicas))
        self.total_size = self.num_samples * self.num_replicas

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.RandomState(self.epoch)
        indices = rng.permutation(self.total_size)
        indices = (indices % self.dataset_size)
        indices = indices[self.rank:self.total_size:self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices.tolist())

    def __len__(self):
        return self.num_samples
