#!/usr/bin/env python
"""Build a comparison grid of method results.

Parity: reference ``create_image_visualisation.py:8-172`` (a grid of
generated / conditioning / measurement images across method run directories).
The reference expected per-run ``config.yaml`` dumps that its driver never
wrote (SURVEY.md §7.4); here the rows are simply the run directories passed on
the command line, each containing the standard ``images/`` (+ optional
``cond_images/``, ``forward_images/``) produced by generate_conditional.py.

Usage:
  python create_image_visualisation.py --runs out/dps out/freehunch \
      --num_images 6 --out grid.png
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import PIL.Image


def _load_row(run_dir: str, sub: str, names):
    row = []
    for n in names:
        p = os.path.join(run_dir, sub, n)
        row.append(np.array(PIL.Image.open(p).convert("RGB")) if os.path.exists(p)
                   else None)
    return row


def build_grid(runs, num_images=6, include_cond=True, include_forward=True,
               pad=4):
    first = runs[0]
    names = sorted(os.listdir(os.path.join(first, "images")))[:num_images]
    rows = []
    labels = []
    if include_cond and os.path.isdir(os.path.join(first, "cond_images")):
        rows.append(_load_row(first, "cond_images", names))
        labels.append("ground truth")
    if include_forward and os.path.isdir(os.path.join(first, "forward_images")):
        rows.append(_load_row(first, "forward_images", names))
        labels.append("measurement")
    for r in runs:
        rows.append(_load_row(r, "images", names))
        labels.append(os.path.basename(os.path.normpath(r)))

    res = next(im.shape[0] for row in rows for im in row if im is not None)
    h = len(rows) * (res + pad) + pad
    w = len(names) * (res + pad) + pad
    canvas = np.full((h, w, 3), 255, np.uint8)
    for i, row in enumerate(rows):
        for j, im in enumerate(row):
            if im is None:
                continue
            if im.shape[0] != res:
                im = np.array(PIL.Image.fromarray(im).resize((res, res)))
            y = pad + i * (res + pad)
            x = pad + j * (res + pad)
            canvas[y:y + res, x:x + res] = im
    return canvas, labels


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs", nargs="+", required=True)
    p.add_argument("--num_images", type=int, default=6)
    p.add_argument("--out", default="visualisation.png")
    args = p.parse_args()
    canvas, labels = build_grid(args.runs, args.num_images)
    PIL.Image.fromarray(canvas).save(args.out)
    print(f"rows: {labels}\nwrote {args.out}")


if __name__ == "__main__":
    main()
