#!/usr/bin/env python
"""Convert reference-trained (PyTorch/Dassl) checkpoints to this
framework's .npz format.

The framework loads reference ``model.pth.tar-<E>`` torch pickles
transparently (``utils/checkpoint.py`` detects them), so this tool is only
needed when the machine that will LOAD the checkpoint has no torch (e.g. a
TPU pod image) — convert once wherever torch exists, ship the .npz.

Usage:
  python tools/import_reference_checkpoint.py --src <reference output dir> \
      [--dst <converted output dir>]

``--src`` may also be a single ``model.pth.tar-<E>`` / ``model-best.pth.tar``
file.  With no ``--dst``, converts in place (the .npz content replaces
nothing — it is written under the same names in a sibling ``converted/``
directory to keep the originals intact).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mudpt_tpu.models.import_reference import (  # noqa: E402
    is_torch_checkpoint,
    load_reference_checkpoint,
)
from mudpt_tpu.utils.checkpoint import save_checkpoint  # noqa: E402

_EPOCH = re.compile(r"^model\.pth\.tar-(\d+)$")
_TAG = re.compile(r"^model-([A-Za-z0-9_]+)\.pth\.tar$")


def convert_file(path: str, dst_root: str, name: str) -> str:
    """Convert one checkpoint file into ``<dst_root>/<name>/<same fname>``."""
    fname = os.path.basename(path)
    m_epoch, m_tag = _EPOCH.match(fname), _TAG.match(fname)
    if not (m_epoch or m_tag):
        raise ValueError(
            f"{fname!r} does not match the Dassl checkpoint naming "
            "(model.pth.tar-<epoch> or model-<tag>.pth.tar)"
        )
    tree, meta = load_reference_checkpoint(path)
    epoch = int(m_epoch.group(1)) if m_epoch else int(meta.get("epoch", 0))
    return save_checkpoint(
        dst_root,
        name,
        epoch,
        tree,
        meta=meta,
        tag=m_tag.group(1) if m_tag else None,
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("--src", required=True,
                    help="reference output dir (or one .pth.tar file)")
    ap.add_argument("--dst", default="",
                    help="output dir (default: <src>/converted)")
    args = ap.parse_args(argv)

    if os.path.isfile(args.src):
        files = [args.src]
        src_root = os.path.dirname(os.path.dirname(os.path.abspath(args.src)))
    else:
        src_root = os.path.abspath(args.src)
        files = []
        for dirpath, _, fnames in os.walk(src_root):
            for f in fnames:
                if _EPOCH.match(f) or _TAG.match(f):
                    files.append(os.path.join(dirpath, f))
    dst_root = args.dst or os.path.join(src_root, "converted")

    converted = skipped = 0
    for path in sorted(files):
        if not is_torch_checkpoint(path):
            print(f"skip (already .npz): {path}")
            skipped += 1
            continue
        # the registered-model subdirectory (e.g. MultimodalDeepPromptTuning)
        name = os.path.basename(os.path.dirname(os.path.abspath(path)))
        out = convert_file(path, dst_root, name)
        print(f"converted: {path} -> {out}")
        converted += 1
    if not files:
        print(f"no model.pth.tar-* / model-*.pth.tar files under {args.src}")
        return 1
    print(f"done: {converted} converted, {skipped} already native")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
