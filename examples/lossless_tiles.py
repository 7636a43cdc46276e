"""Example: lossless JPEG tiling + rotation in the coefficient domain.

Splits a JPEG into iMCU-aligned tiles and rotates alternate tiles —
without ever dequantising a pixel (picha.transformJpegSync, the
jpegtran feature class rebuilt on the framework's coefficient
infrastructure; see ops/jpeg_transform.py for the math). The entropy
decode behind it picks the restart-segment-parallel native decoder
when the file has restart markers and cores are free.

    python examples/lossless_tiles.py photo.jpg out_dir [tile=512]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from a checkout without install

import picha_tpu as picha  # noqa: E402


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    src, out_dir = sys.argv[1], sys.argv[2]
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    os.makedirs(out_dir, exist_ok=True)
    buf = open(src, "rb").read()
    st = picha.statJpeg(buf)
    print(f"{src}: {st['width']}x{st['height']} {st['pixel']}")
    n = 0
    for ty in range(0, st["height"] - tile + 1, tile):
        for tx in range(0, st["width"] - tile + 1, tile):
            t = picha.transformJpegSync(buf, {
                "op": "crop", "x": tx, "y": ty,
                "width": tile, "height": tile})
            if (tx // tile + ty // tile) % 2:
                t = picha.transformJpegSync(t, {"op": "rot180"})
            name = os.path.join(out_dir, f"tile_{ty}_{tx}.jpg")
            with open(name, "wb") as f:
                f.write(t)
            n += 1
    print(f"wrote {n} lossless tiles to {out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
