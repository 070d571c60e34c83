#!/usr/bin/env python
"""Export checkpoints trained HERE as reference-format (PyTorch/Dassl)
checkpoints, so prompts can be validated or served inside the reference
stack (inverse of tools/import_reference_checkpoint.py).

Usage:
  python tools/export_reference_checkpoint.py --src <output dir> \
      [--dst <exported dir>]

``--src`` may also be a single ``model.pth.tar-<E>`` / ``model-best.pth.tar``
.npz file.  The exported files keep the Dassl names, so the reference's
``--model-dir`` / ``load_model`` consume the directory as-is.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mudpt_tpu.models.export_reference import (  # noqa: E402
    save_reference_checkpoint,
)
from mudpt_tpu.models.import_reference import is_torch_checkpoint  # noqa: E402
from mudpt_tpu.utils.checkpoint import load_checkpoint  # noqa: E402

_NAME = re.compile(r"^model(\.pth\.tar-(\d+)|-[A-Za-z0-9_]+\.pth\.tar)$")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("--src", required=True,
                    help="our output dir (or one .npz checkpoint file)")
    ap.add_argument("--dst", default="",
                    help="output dir (default: <src>/exported)")
    args = ap.parse_args(argv)

    if os.path.isfile(args.src):
        files = [os.path.abspath(args.src)]
        src_root = os.path.dirname(os.path.dirname(files[0]))
    else:
        src_root = os.path.abspath(args.src)
        files = []
        for dirpath, _, fnames in os.walk(src_root):
            for f in fnames:
                if _NAME.match(f):
                    files.append(os.path.join(dirpath, f))
    dst_root = args.dst or os.path.join(src_root, "exported")

    exported = skipped = 0
    for path in sorted(files):
        if is_torch_checkpoint(path):
            print(f"skip (already torch): {path}")
            skipped += 1
            continue
        name = os.path.basename(os.path.dirname(path))
        fname = os.path.basename(path)
        m = _NAME.match(fname)
        epoch = int(m.group(2)) if m.group(2) else 0
        tree, _, meta = load_checkpoint(
            os.path.dirname(os.path.dirname(path)), name,
            epoch=epoch if m.group(2) else None,
            tag=None if m.group(2) else fname[len("model-"):-len(".pth.tar")],
        )
        outdir = os.path.join(dst_root, name)
        os.makedirs(outdir, exist_ok=True)
        out = save_reference_checkpoint(
            os.path.join(outdir, fname), tree,
            epoch=int(meta.get("epoch", epoch)),
        )
        print(f"exported: {path} -> {out}")
        exported += 1
    if not files:
        print(f"no model.pth.tar-* / model-*.pth.tar files under {args.src}")
        return 1
    print(f"done: {exported} exported, {skipped} already torch")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
