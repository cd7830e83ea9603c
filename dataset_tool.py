#!/usr/bin/env python
"""Dataset preparation tool: convert image collections into the framework's
folder/zip layout, with optional VAE latent encode/decode.

Parity: reference ``dataset_tool.py`` — ``convert:269`` with the three
transforms of ``make_transform:131`` (center-crop, center-crop-wide,
center-crop-dhariwal — the ADM preprocessing), writing PNGs + ``dataset.json``
into a directory or zip; ``encode:384`` / ``decode:423`` (SD-VAE latents,
gated on the diffusers VAE being available). argparse CLI instead of click.

Usage:
  python dataset_tool.py convert --source=in_dir --dest=out.zip \
      --resolution=256x256 --transform=center-crop-dhariwal
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import zipfile
from typing import Optional

import numpy as np
import PIL.Image

_EXTS = {".png", ".jpg", ".jpeg"}


def _scale(width, height, img):
    if img.shape[1] == width and img.shape[0] == height:
        return img
    im = PIL.Image.fromarray(img, "RGB")
    return np.array(im.resize((width or img.shape[1], height or img.shape[0]),
                              PIL.Image.Resampling.LANCZOS))


def _center_crop(width, height, img):
    crop = min(img.shape[:2])
    img = img[(img.shape[0] - crop) // 2:(img.shape[0] + crop) // 2,
              (img.shape[1] - crop) // 2:(img.shape[1] + crop) // 2]
    im = PIL.Image.fromarray(img, "RGB")
    return np.array(im.resize((width, height), PIL.Image.Resampling.LANCZOS))


def _center_crop_wide(width, height, img):
    ch = int(np.round(width * img.shape[0] / img.shape[1]))
    if img.shape[1] < width or ch < height:
        return None
    img = img[(img.shape[0] - ch) // 2:(img.shape[0] + ch) // 2]
    im = PIL.Image.fromarray(img, "RGB")
    img = np.array(im.resize((width, height), PIL.Image.Resampling.LANCZOS))
    canvas = np.zeros([width, width, 3], np.uint8)
    canvas[(width - height) // 2:(width + height) // 2, :] = img
    return canvas


def _center_crop_dhariwal(image_size, img):
    """ADM preprocessing: halve with BOX until < 2x target, BICUBIC to target
    on the short side, center crop (reference :168-187)."""
    im = PIL.Image.fromarray(img)
    while min(*im.size) >= 2 * image_size:
        im = im.resize(tuple(x // 2 for x in im.size), PIL.Image.Resampling.BOX)
    scale = image_size / min(*im.size)
    im = im.resize(tuple(round(x * scale) for x in im.size),
                   PIL.Image.Resampling.BICUBIC)
    arr = np.array(im)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    return arr[cy:cy + image_size, cx:cx + image_size]


def make_transform(transform: Optional[str], width: Optional[int],
                   height: Optional[int]):
    if transform is None:
        return functools.partial(_scale, width, height)
    if transform == "center-crop":
        return functools.partial(_center_crop, width, height)
    if transform == "center-crop-wide":
        return functools.partial(_center_crop_wide, width, height)
    if transform == "center-crop-dhariwal":
        assert width == height, "dhariwal transform needs a square resolution"
        return functools.partial(_center_crop_dhariwal, width)
    raise ValueError(f"unknown transform {transform!r}")


def _iter_source(source, max_images=None):
    if os.path.isdir(source):
        files = sorted(os.path.join(r, f) for r, _d, fs in os.walk(source)
                       for f in fs if os.path.splitext(f)[1].lower() in _EXTS)
        labels = {}
        lp = os.path.join(source, "dataset.json")
        if os.path.exists(lp):
            data = json.load(open(lp)).get("labels") or []
            labels = {os.path.join(source, a): b for a, b in data}
        files = files[:max_images]
        for f in files:
            yield np.array(PIL.Image.open(f).convert("RGB")), labels.get(f)
    elif zipfile.is_zipfile(source):
        with zipfile.ZipFile(source) as z:
            names = [n for n in sorted(z.namelist())
                     if os.path.splitext(n)[1].lower() in _EXTS]
            labels = {}
            if "dataset.json" in z.namelist():
                data = json.loads(z.read("dataset.json")).get("labels") or []
                labels = dict(data)
            for n in names[:max_images]:
                with z.open(n) as f:
                    yield np.array(PIL.Image.open(f).convert("RGB")), labels.get(n)
    else:
        raise SystemExit(f"missing input file or directory: {source}")


class _Dest:
    """PNG + dataset.json writer for a directory or zip destination."""

    def __init__(self, dest: str):
        self.dest = dest
        self.zip = None
        if dest.endswith(".zip"):
            os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
            self.zip = zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED)
        else:
            os.makedirs(dest, exist_ok=True)
        self.labels = []

    def write(self, idx: int, img: np.ndarray, label):
        name = f"{idx // 1000:05d}/img{idx:08d}.png"
        buf = PIL.Image.fromarray(img, "RGB")
        if self.zip is not None:
            import io
            bio = io.BytesIO()
            buf.save(bio, format="png", compress_level=0)
            self.zip.writestr(name, bio.getvalue())
        else:
            path = os.path.join(self.dest, name)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            buf.save(path)
        if label is not None:
            self.labels.append([name, label])

    def close(self):
        meta = json.dumps({"labels": self.labels or None})
        if self.zip is not None:
            self.zip.writestr("dataset.json", meta)
            self.zip.close()
        else:
            with open(os.path.join(self.dest, "dataset.json"), "w") as f:
                f.write(meta)


def convert(source, dest, resolution=None, transform=None, max_images=None):
    width = height = None
    if resolution:
        width, height = (int(v) for v in resolution.split("x"))
    tf = make_transform(transform, width, height)
    out = _Dest(dest)
    n = 0
    for img, label in _iter_source(source, max_images):
        img = tf(img)
        if img is None:
            continue
        out.write(n, img, label)
        n += 1
    out.close()
    print(f"wrote {n} images to {dest}")
    return n


def encode(source, dest, vae_name="stabilityai/sd-vae-ft-mse", max_images=None):
    """Images -> SD-VAE latent .npy files (reference encode:384; needs the
    diffusers VAE weights)."""
    from free_hunch_tpu.data.encoders import StabilityVAEEncoder
    enc = StabilityVAEEncoder(vae_name=vae_name)
    enc.init()
    os.makedirs(dest, exist_ok=True)
    for i, (img, _label) in enumerate(_iter_source(source, max_images)):
        z = enc.encode(img.transpose(2, 0, 1)[None])
        np.save(os.path.join(dest, f"latent{i:08d}.npy"), np.asarray(z))
    print(f"encoded latents to {dest}")


def decode(source, dest, vae_name="stabilityai/sd-vae-ft-mse"):
    """Latent .npy files -> PNGs (reference decode:423)."""
    from free_hunch_tpu.data.encoders import StabilityVAEEncoder
    enc = StabilityVAEEncoder(vae_name=vae_name)
    enc.init()
    os.makedirs(dest, exist_ok=True)
    for f in sorted(os.listdir(source)):
        if not f.endswith(".npy"):
            continue
        x = enc.decode(np.load(os.path.join(source, f)))
        PIL.Image.fromarray(np.asarray(x)[0].transpose(1, 2, 0), "RGB").save(
            os.path.join(dest, f.replace(".npy", ".png")))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert")
    c.add_argument("--source", required=True)
    c.add_argument("--dest", required=True)
    c.add_argument("--resolution")
    c.add_argument("--transform", choices=["center-crop", "center-crop-wide",
                                           "center-crop-dhariwal"])
    c.add_argument("--max-images", type=int)
    e = sub.add_parser("encode")
    e.add_argument("--source", required=True)
    e.add_argument("--dest", required=True)
    e.add_argument("--max-images", type=int)
    d = sub.add_parser("decode")
    d.add_argument("--source", required=True)
    d.add_argument("--dest", required=True)
    args = p.parse_args()
    if args.cmd == "convert":
        convert(args.source, args.dest, args.resolution, args.transform,
                args.max_images)
    elif args.cmd == "encode":
        encode(args.source, args.dest, max_images=args.max_images)
    else:
        decode(args.source, args.dest)


if __name__ == "__main__":
    main()
