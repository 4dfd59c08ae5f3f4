"""Media-decode throughput bench (VERDICT r10 what's-wrong #2).

Every mm_ correctness witness decodes tiny synthesized images (8-12 px),
which proves the codecs right but says nothing about COST at realistic
blob sizes. This tool synthesizes >=100 KB blobs with the repo's own
encoders and measures single-core decode throughput for the pure-Python
paths (the portable fallback + oracle) against the header-walk path
(the 100 TB scan default) — the numbers behind docs/SCALE.md's
media-decode cost model. No Spark: the measured cost is executor-side
per-core Python, which is exactly what one Arrow-batch slot pays.

Usage: python tools/media_bench.py [--side 256] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from write_optimized_vector_database_spark.operators import multimodal as MM


def _pixels_rgb(side: int, seed: int = 7):
    import numpy as np

    rng = np.random.default_rng(seed)
    # moderate-entropy content: smooth gradient + noise, so entropy
    # coders do realistic work (all-random defeats LZW/Huffman, flat
    # images flatter them)
    base = np.add.outer(np.arange(side), np.arange(side)) % 256
    noise = rng.integers(0, 32, (side, side))
    r = ((base + noise) % 256).astype(int)
    g = ((base * 2 + noise) % 256).astype(int)
    b = ((base * 3 + noise) % 256).astype(int)
    return [
        [(int(r[y, x]), int(g[y, x]), int(b[y, x])) for x in range(side)]
        for y in range(side)
    ]


def _pixels_gray(side: int, seed: int = 7):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = np.add.outer(np.arange(side), np.arange(side)) % 256
    return ((base + rng.integers(0, 32, (side, side))) % 256).astype(int).tolist()


def _gif_pixels(side: int, seed: int = 7):
    # GIF needs <=256 unique colors: quantize the RGB gradient
    px = _pixels_rgb(side, seed)
    return [[(r & 0xE0, g & 0xE0, b & 0xC0) for (r, g, b) in row] for row in px]


def _time(fn, blob: bytes, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn(blob)
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    side = args.side

    cases = []
    print(f"synthesizing {side}x{side} blobs ...", file=sys.stderr)
    png = MM.encode_png(_pixels_rgb(side))
    cases.append(("png_rgb8", png, MM.decode_png))
    gif = MM.encode_gif(_gif_pixels(side))
    cases.append(("gif_lzw", gif, MM.decode_gif))
    jpg = MM.encode_jpeg(_pixels_gray(side))
    cases.append(("jpeg_baseline_gray", jpg, MM.decode_jpeg))
    jpgc = MM.encode_jpeg(_pixels_rgb(side), subsample=2)
    cases.append(("jpeg_baseline_ycbcr420", jpgc, MM.decode_jpeg))
    jpgp = MM.encode_jpeg_progressive(_pixels_gray(side))
    cases.append(("jpeg_progressive_gray", jpgp, MM.decode_jpeg_progressive))

    out = {"side": side, "cases": {}}
    for name, blob, dec in cases:
        wall = _time(dec, blob, args.reps)
        hdr = _time(MM.parse_media_header, blob, max(args.reps, 20))
        npx = side * side
        out["cases"][name] = {
            "blob_kb": round(len(blob) / 1024, 1),
            "decode_s": round(wall, 3),
            "decode_kb_per_s": round(len(blob) / 1024 / wall, 1),
            "decode_px_per_s": int(npx / wall),
            "header_walk_us": round(hdr * 1e6, 1),
            "header_speedup": int(wall / hdr) if hdr > 0 else None,
        }
        print(
            f"{name:24s} {out['cases'][name]['blob_kb']:8.1f} KB  "
            f"decode {wall:7.3f} s  "
            f"{out['cases'][name]['decode_kb_per_s']:8.1f} KB/s  "
            f"{out['cases'][name]['decode_px_per_s']:>9d} px/s  "
            f"header {out['cases'][name]['header_walk_us']:8.1f} us",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
