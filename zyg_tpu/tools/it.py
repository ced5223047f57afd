"""`it` — image toolbox (ref: src/it/).

Operators, mirroring the reference CLI surface (it/operator.zig Class):
  --diff A B ...     difference images + RMSE/max stats (the de-facto
                     regression harness, ref it/operator.zig Diff)
  --denoise          joint bilateral denoise using albedo/normal/depth AOVs
                     (ref it/denoise.zig)
  --add              sum of all inputs (ref operator.zig .Add)
  --average          mean of all inputs (.Average)
  --mul              product of all inputs (.Mul)
  --over             alpha-over composite front-to-back (.Over)
  --max-value R G B  elementwise max against a constant floor (.MaxValue)
  --anaglyph         red/cyan stereo merge of an image pair (.Anaglyph)
  --down N           integer box down-sample
  --blur S           gaussian blur
  --cat              horizontal concatenation
  --tonemap NAME     tonemap + format conversion
  -o / --output      output file (format by extension: png/exr/hdr)

Usage: python -m zyg_tpu.tools.it --diff a.exr b.exr -o diff.png
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def load_image(path: str) -> np.ndarray:
    from ..scene.loader import load_image as _li

    img = _li(path)
    if img is None:
        raise SystemExit(f"it: cannot load {path}")
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    return img[..., :3] if img.shape[-1] >= 3 else np.repeat(img, 3, axis=-1)


def save_image(path: str, img: np.ndarray) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".exr":
        from ..io.exr import write_exr

        write_exr(path, {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]})
    elif ext == ".hdr":
        from ..io.rgbe import write_hdr

        write_hdr(path, img)
    else:
        from ..io.png import write_png, float_to_srgb8

        write_png(path, float_to_srgb8(img))


def op_diff(paths: list[str], clamp: float = 1.0):
    """Pairwise diff vs the first image. Returns (diff image, stats dict)."""
    ref = load_image(paths[0])
    stats = []
    out = None
    for p in paths[1:]:
        img = load_image(p)
        h = min(ref.shape[0], img.shape[0])
        w = min(ref.shape[1], img.shape[1])
        d = np.abs(ref[:h, :w] - img[:h, :w])
        stats.append(
            {
                "image": p,
                "rmse": float(np.sqrt(np.mean(d * d))),
                "max": float(d.max()),
                "mean": float(d.mean()),
                "psnr": float(20 * np.log10(max(ref.max(), 1e-6) / max(np.sqrt(np.mean(d * d)), 1e-12))),
            }
        )
        out = np.clip(d / clamp, 0.0, 1.0)
    return out, stats


def op_downsample(img: np.ndarray, n: int) -> np.ndarray:
    h, w = (img.shape[0] // n) * n, (img.shape[1] // n) * n
    return img[:h, :w].reshape(h // n, n, w // n, n, -1).mean(axis=(1, 3))


def op_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    r = max(int(3 * sigma), 1)
    x = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    out = img
    out = np.apply_along_axis(lambda row: np.convolve(row, k, mode="same"), 1, out)
    out = np.apply_along_axis(lambda col: np.convolve(col, k, mode="same"), 0, out)
    return out


def op_cat(images: list[np.ndarray]) -> np.ndarray:
    h = max(i.shape[0] for i in images)
    padded = [
        np.pad(i, ((0, h - i.shape[0]), (0, 0), (0, 0))) for i in images
    ]
    return np.concatenate(padded, axis=1)


def _common_hw(images: list[np.ndarray]):
    h = min(i.shape[0] for i in images)
    w = min(i.shape[1] for i in images)
    return [i[:h, :w] for i in images]


def op_add(images: list[np.ndarray]) -> np.ndarray:
    """Sum of all inputs (ref it/operator.zig .Add)."""
    images = _common_hw(images)
    return np.sum(images, axis=0)


def op_average(images: list[np.ndarray]) -> np.ndarray:
    """Mean of all inputs (ref .Average: factor = 1/len)."""
    images = _common_hw(images)
    return np.mean(images, axis=0)


def op_mul(images: list[np.ndarray]) -> np.ndarray:
    """Product of all inputs (ref .Mul)."""
    images = _common_hw(images)
    out = images[0].copy()
    for i in images[1:]:
        out *= i
    return out


def op_max_value(img: np.ndarray, floor) -> np.ndarray:
    """Elementwise max against a constant (ref .MaxValue)."""
    return np.maximum(img, np.asarray(floor, np.float32))


def op_over(images: list[np.ndarray], alphas: list[np.ndarray | None]) -> np.ndarray:
    """Front-to-back over composite: color += other * (1 - alpha) with the
    running alpha accumulating the same way (ref .Over). Inputs without an
    alpha channel are treated as opaque."""
    images = _common_hw(images)
    h, w, _ = images[0].shape
    color = images[0].copy()
    a = alphas[0]
    alpha = np.ones((h, w, 1), np.float32) if a is None else a[:h, :w]
    for img, a in zip(images[1:], alphas[1:]):
        oa = np.ones((h, w, 1), np.float32) if a is None else a[:h, :w]
        color = color + img * (1.0 - alpha)
        alpha = alpha + oa * (1.0 - alpha)
    return color


def op_anaglyph(a: np.ndarray, b: np.ndarray, tonemapper: str = "Linear") -> np.ndarray:
    """Red/cyan stereo merge: R from the left eye, GB from the right
    (ref .Anaglyph; both eyes are tonemapped first)."""
    if tonemapper:
        import jax.numpy as jnp

        from ..render.sensor import tonemap

        a = np.asarray(tonemap(jnp.asarray(a), tonemapper))
        b = np.asarray(tonemap(jnp.asarray(b), tonemapper))
    a, b = _common_hw([a, b])
    return np.concatenate([a[..., 0:1], b[..., 1:3]], axis=-1)


def op_denoise(color: np.ndarray, albedo=None, normal=None, depth=None, radius: int = 3,
               sigma_color: float = 0.25, sigma_feature: float = 0.2) -> np.ndarray:
    """Joint bilateral filter guided by AOVs (ref it/denoise.zig)."""
    h, w, _ = color.shape
    acc = np.zeros_like(color)
    wacc = np.zeros((h, w, 1), np.float32)
    inv2sc = 1.0 / (2 * sigma_color * sigma_color)
    inv2sf = 1.0 / (2 * sigma_feature * sigma_feature)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            ys = slice(max(dy, 0), h + min(dy, 0))
            yd = slice(max(-dy, 0), h + min(-dy, 0))
            xs = slice(max(dx, 0), w + min(dx, 0))
            xd = slice(max(-dx, 0), w + min(-dx, 0))
            wgt = np.exp(-(dx * dx + dy * dy) / (2.0 * radius * radius)) * np.ones((h, w), np.float32)[yd, xd]
            dc = color[ys, xs] - color[yd, xd]
            wgt = wgt * np.exp(-np.sum(dc * dc, -1) * inv2sc)
            for feat in (albedo, normal):
                if feat is not None:
                    df = feat[ys, xs] - feat[yd, xd]
                    wgt = wgt * np.exp(-np.sum(df * df, -1) * inv2sf)
            if depth is not None:
                dd = depth[ys, xs, 0] - depth[yd, xd, 0]
                wgt = wgt * np.exp(-dd * dd * inv2sf)
            acc[yd, xd] += wgt[..., None] * color[ys, xs]
            wacc[yd, xd] += wgt[..., None]
    return acc / np.maximum(wacc, 1e-8)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="it", description="image toolbox")
    p.add_argument("inputs", nargs="*")
    p.add_argument("--diff", nargs="+", help="reference image + comparisons")
    p.add_argument("--denoise", action="store_true")
    p.add_argument("--albedo")
    p.add_argument("--normal")
    p.add_argument("--depth")
    p.add_argument("--down", type=int, default=0)
    p.add_argument("--blur", type=float, default=0.0)
    p.add_argument("--cat", action="store_true")
    p.add_argument("--add", action="store_true")
    p.add_argument("--average", action="store_true")
    p.add_argument("--mul", action="store_true")
    p.add_argument("--over", action="store_true")
    p.add_argument("--anaglyph", action="store_true")
    p.add_argument("--max-value", nargs=3, type=float, metavar=("R", "G", "B"))
    p.add_argument("--tonemap", default="")
    p.add_argument("-o", "--output", default="it_out.png")
    args = p.parse_args(argv)

    if args.diff:
        out, stats = op_diff(args.diff)
        print(json.dumps(stats, indent=2))
        if out is not None:
            save_image(args.output, out)
        return 0

    if not args.inputs:
        p.print_help()
        return 1
    imgs = [load_image(x) for x in args.inputs]
    img = imgs[0]

    if args.denoise:
        # auto-discover the renderer's AOV companion exports
        # (<stem>_albedo.exr etc., written when the take enables AOVs)
        stem = os.path.splitext(args.inputs[0])[0]

        def companion(explicit, name):
            if explicit:
                return load_image(explicit)
            cand = f"{stem}_{name}.exr"
            return load_image(cand) if os.path.exists(cand) else None

        img = op_denoise(
            img,
            albedo=companion(args.albedo, "albedo"),
            normal=companion(args.normal, "shading_normal"),
            depth=companion(args.depth, "depth"),
        )
    if args.add:
        img = op_add(imgs)
    if args.average:
        img = op_average(imgs)
    if args.mul:
        img = op_mul(imgs)
    if args.over:
        img = op_over(imgs, [None] * len(imgs))
    if args.anaglyph:
        if len(imgs) < 2:
            raise SystemExit("it: --anaglyph needs an image pair")
        img = op_anaglyph(imgs[0], imgs[1], args.tonemap or "Linear")
    if args.max_value is not None:
        img = op_max_value(img, args.max_value)
    if args.down > 1:
        img = op_downsample(img, args.down)
    if args.blur > 0:
        img = op_blur(img, args.blur)
    if args.cat and len(imgs) > 1:
        img = op_cat(imgs)
    if args.tonemap:
        import jax.numpy as jnp

        from ..render.sensor import tonemap

        img = np.asarray(tonemap(jnp.asarray(img), args.tonemap))
    save_image(args.output, img)
    return 0


if __name__ == "__main__":
    sys.exit(main())
