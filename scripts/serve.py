#!/usr/bin/env python
"""Batch serving CLI: throughput-oriented RefSR inference over a pair list.

The reference's only inference surface is the batch-1 eval protocol
(mmsr/test.py:13-66 -> ref_restoration_model.py:295-370). This entry
point is the production-serving counterpart this framework adds: it
streams (input, ref) pairs from a test dataset config, groups them into
batches of shape-compatible images (bucketed static shapes — one XLA
compile per bucket, SURVEY.md §7), runs the fused serving forward at
batch N, and writes x4 outputs.

    python scripts/serve.py -opt options/test/test_C2_matching_serving.yml \
        --batch 16 [--out results/<name>_serve]

Images whose (padded LR, original GT) shapes differ land in different
buckets; each bucket flushes when it reaches --batch (a final partial
flush pads the batch by repeating the last item and drops the padding
after — static batch shape, no recompile). Items are decoded/
preprocessed by a bounded background prefetch so host PIL work overlaps
device compute without buffering the whole set.

Reported throughput is END-TO-END (decode + PIL bicubic chain + device
compute + PNG encode); on a 1-core host the PIL chain dominates — use
bench.py for isolated chip throughput.
"""
import os

if os.environ.get('C2MATCHING_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['C2MATCHING_PLATFORM'])

import argparse
import collections
import logging
import os.path as osp
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), osp.pardir)))

import jax

from c2matching_tpu.data import create_dataset
from c2matching_tpu.data.loader import default_collate
from c2matching_tpu.models import create_model
from c2matching_tpu.utils import dict_to_nonedict, get_root_logger
from c2matching_tpu.utils.compile_cache import enable_persistent_cache
from c2matching_tpu.utils.options import parse
from c2matching_tpu.utils.util import imwrite, tensor2img


def _prefetched(dataset, n, pool, window):
    """Yield dataset items in order with at most `window` decodes in
    flight — bounded host memory, unlike an eager pool.map over n."""
    pending = collections.deque(
        pool.submit(dataset.__getitem__, i)
        for i in range(min(window, n)))
    nxt = len(pending)
    while pending:
        yield pending.popleft().result()
        if nxt < n:
            pending.append(pool.submit(dataset.__getitem__, nxt))
            nxt += 1


def bucket_batches(items_iter, batch_size):
    """Group an item stream into shape-compatible batches of up to
    batch_size, yielding (items, names) per flush.

    Buckets on BOTH the padded LR shape and the unpadded GT shape: test
    items pad input/ref to their common max but keep img_in at the
    original GT size, so two pairs can share an LR shape while their
    img_in shapes differ (collate would fail on one batch). Leftover
    partial buckets are yielded at the end.
    """
    buckets = {}  # (lq (h, w), gt (h, w)) -> (items, names)
    for idx, item in enumerate(items_iter):
        key = (item['img_in_lq'].shape[:2], item['img_in'].shape[:2])
        items, names = buckets.setdefault(key, ([], []))
        items.append(item)
        names.append(osp.splitext(
            osp.basename(item.get('lq_path') or f'{idx:06d}'))[0]
            + f'_{idx:06d}')
        if len(items) == batch_size:
            yield buckets.pop(key)
    yield from buckets.values()


def _flush(model, items, names, out_dir, batch_size, logger):
    """Run one bucket batch (padded to batch_size) and write outputs."""
    n_real = len(items)
    padded = items + [items[-1]] * (batch_size - n_real)
    batch = default_collate(padded)
    model.feed_data(batch)
    model.test()
    out = np.asarray(jax.device_get(model.output))
    if model._eval_crop is not None:
        out = out[:, :model._eval_crop[0], :model._eval_crop[1]]
    for i in range(n_real):
        img = tensor2img(out[i])
        pad = padded[i].get('padding')
        if pad:
            oh, ow = padded[i]['original_size']
            img = img[:int(oh), :int(ow)]
        path = osp.join(out_dir, f'{names[i]}.png')
        imwrite(img, path)
    logger.info(f'served {n_real} images '
                f'(bucket {items[0]["img_in_lq"].shape[:2]})')
    return n_real


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to a test/serving option YAML file.')
    parser.add_argument('--batch', type=int, default=16,
                        help='serving batch size (static; partial final '
                             'batches are padded)')
    parser.add_argument('--out', type=str, default=None,
                        help='output dir (default results/<name>_serve)')
    args = parser.parse_args()
    opt = parse(args.opt, is_train=False)
    opt = dict_to_nonedict(opt)
    enable_persistent_cache()  # bucket compiles are minutes cold, once

    out_dir = args.out or osp.join('results', f"{opt['name']}_serve")
    os.makedirs(out_dir, exist_ok=True)
    logger = get_root_logger(logger_name='base', log_level=logging.INFO,
                             log_file=osp.join(out_dir, 'serve.log'))

    model = create_model(opt)

    test_phases = sorted(p for p in opt['datasets']
                         if p.startswith('test'))
    for phase in test_phases:
        dataset_opt = opt['datasets'][phase]
        dataset = create_dataset(dataset_opt)
        n = len(dataset)
        # one subdirectory per dataset when serving several phases —
        # per-phase name indices restart at 0 and ref basenames can
        # repeat across sets (CUFED5 + WR-SR), which would silently
        # overwrite the earlier phase's outputs in a shared dir
        phase_dir = (out_dir if len(test_phases) == 1 else
                     osp.join(out_dir, str(dataset_opt['name'] or phase)))
        os.makedirs(phase_dir, exist_ok=True)
        logger.info(f"serving {n} pairs from {dataset_opt['name']} "
                    f'at batch {args.batch} -> {phase_dir}')

        t0 = time.time()
        served = 0
        with ThreadPoolExecutor(max_workers=2) as pool:
            stream = _prefetched(dataset, n, pool, window=2 * args.batch)
            for items, names in bucket_batches(stream, args.batch):
                served += _flush(model, items, names, phase_dir,
                                 args.batch, logger)
        dt = time.time() - t0
        logger.info(f'{served} images in {dt:.1f}s end-to-end '
                    f'({served / dt:.2f} img/s incl. host decode/PIL; '
                    f'see bench.py for chip-isolated throughput)')


if __name__ == '__main__':
    main()
