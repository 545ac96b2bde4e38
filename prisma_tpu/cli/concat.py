"""Contact-sheet concatenation of bands (reference `concat.py`).

Builds one image or video from a PRISMA folder: bands in the top list are
horizontally concatenated, likewise the bottom list, and the two rows are
stacked vertically (concat.py:23-117). Defaults: top=depth_patchfusion,
bottom=rgba (concat.py:19-20).
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

from prisma_tpu.io.video import VideoReader, VideoWriter
from prisma_tpu.utils import meta

DEFAULT_TOP = ["depth_patchfusion"]
DEFAULT_BOTTOM = ["rgba"]


def _band_path(folder: str, data: dict, band: str) -> str:
    return os.path.join(folder, data["bands"][band]["url"])


def _row(images):
    row = None
    for img in images:
        row = img if row is None else cv2.hconcat([row, img])
    return row


def concat_image(folder: str, output: str, data: dict, top, bottom) -> None:
    top_row = _row([cv2.imread(_band_path(folder, data, b)) for b in top])
    bottom_row = _row([cv2.imread(_band_path(folder, data, b)) for b in bottom])
    if top_row is None:
        conc = bottom_row
    elif bottom_row is None:
        conc = top_row
    else:
        conc = cv2.vconcat([top_row, bottom_row])
    cv2.imwrite(output, conc)


def concat_video(folder: str, output: str, data: dict, top, bottom) -> None:
    readers = {b: VideoReader(_band_path(folder, data, b))
               for b in list(top) + list(bottom)}
    width = max(sum(readers[b].width for b in row) or 0
                for row in (top, bottom) if row) if (top or bottom) else 0
    height = (max((readers[b].height for b in top), default=0)
              + max((readers[b].height for b in bottom), default=0))

    writer = VideoWriter(width, height, data["fps"], filename=output)
    for _ in range(int(data["frames"])):
        top_row = _row([readers[b].read() for b in top]) if top else None
        bottom_row = _row([readers[b].read() for b in bottom]) if bottom else None
        if top_row is None:
            frame = bottom_row
        elif bottom_row is None:
            frame = top_row
        else:
            frame = cv2.vconcat([top_row, bottom_row])
        writer.write(frame)
    writer.close()
    for r in readers.values():
        r.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-input", "-i", help="Input folder", type=str,
                        required=True)
    parser.add_argument("-output", "-o", help="Output file", type=str,
                        required=True)
    parser.add_argument("-top", "-t", help="Top row of bands", type=str,
                        nargs="+")
    parser.add_argument("-bottom", "-b", help="Bottom row of bands", type=str,
                        nargs="+")
    args = parser.parse_args(argv)

    data = meta.load_metadata(args.input)
    if data is None:
        raise SystemExit(f"ERROR: No metadata found in {args.input}")
    top = args.top or DEFAULT_TOP
    bottom = args.bottom or DEFAULT_BOTTOM
    if meta.is_video(data["bands"]["rgba"]["url"]):
        concat_video(args.input, args.output, data, top, bottom)
    else:
        concat_image(args.input, args.output, data, top, bottom)


if __name__ == "__main__":
    main()
