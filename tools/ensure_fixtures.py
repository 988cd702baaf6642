#!/usr/bin/env python
"""Regenerate any missing synthetic data corpora the configs train on.

data/ is gitignored and wiped between rounds; the phantom generator is
deterministic (seed 0 default), so regeneration reproduces the exact
corpora every measured number was trained/evaluated on. tpu_queue.py
calls this before running steps — a missing corpus must never burn a
hardware window again (it cascaded FAILs through ganft2/w96_100k on
2026-08-19 before this preflight existed).

Corpus table mirrors every `data_folder` referenced by config_files/*.ini.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# root (relative to repo) -> synthetic-CLI args
CORPORA = {
    "data/OASIS/example": ["--dataset", "oasis"],
    "data/OASIS/example20": ["--dataset", "oasis", "--n-patients", "20"],
    "data/BraTS/example8": ["--dataset", "brats", "--n-patients", "8"],
    "data/ACDC/example8": ["--dataset", "acdc", "--n-patients", "8"],
    "data/COVID/example8": ["--dataset", "covid", "--n-patients", "8"],
}


# Written into a corpus root only after its generator exits cleanly; a
# non-empty directory without it is a partial corpus (generator killed
# mid-run) and gets regenerated — presence-by-non-emptiness let exactly
# that case slip through (advisor r4).
MARKER = ".fixtures_complete"


def ensure(only=None):
    made = []
    for rel, args in CORPORA.items():
        if only and rel not in only:
            continue
        root = os.path.join(ROOT, rel)
        if os.path.exists(os.path.join(root, MARKER)):
            continue
        cmd = [sys.executable, "-m", "rdst_tpu.data.synthetic",
               "--root", rel] + args
        print(f"[ensure_fixtures] regenerating {rel}", flush=True)
        subprocess.run(cmd, cwd=ROOT, check=True)
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, MARKER), "w") as f:
            f.write(" ".join(args) + "\n")
        made.append(rel)
    return made


def _normalize_only(argv):
    """Map CLI corpus names onto CORPORA keys; unknown names are an
    error, not a silent no-op (advisor r4: './data/X/' matched nothing)."""
    sel = []
    for a in argv:
        key = os.path.normpath(a)
        if key not in CORPORA:
            raise SystemExit(
                f"[ensure_fixtures] unknown corpus {a!r} "
                f"(choose from: {', '.join(CORPORA)})")
        sel.append(key)
    return sel


if __name__ == "__main__":
    made = ensure(only=_normalize_only(sys.argv[1:]) or None)
    print(f"[ensure_fixtures] regenerated {len(made)} corpora"
          + (f": {', '.join(made)}" if made else " (all present)"))
