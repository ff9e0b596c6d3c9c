"""Raw QM9 ``.xyz`` → loader-format converter.

Raw QM9 files (as shipped in the reference's ``data/QM9.tar.gz``) are *not*
loadable by the framework's (or the reference's) loader: line 2 is the GDB
property line (``gdb 73000 ...``) where the loader expects a float net charge
(SURVEY §8 Q8).  The reference repo contains converted copies inside
``mixed/`` with header ``<natoms>\\n0 0`` and the trailing per-atom Mulliken
column preserved (ignored by the loader).  This module performs that
conversion, including the raw-QM9 ``*^`` scientific-notation fixup.
"""

from __future__ import annotations

import os
from typing import Dict

QM9_HEADER_CHARGE_LINE = "0 0"


def _fix_number(tok: str) -> str:
    # raw QM9 uses Mathematica-style "1.234*^-6"
    return tok.replace("*^", "e")


def convert_text(text: str) -> str:
    lines = text.splitlines()
    if len(lines) < 3:
        raise ValueError("not a QM9 xyz: fewer than 3 lines")
    natoms = int(lines[0].split()[0])
    out = [str(natoms), QM9_HEADER_CHARGE_LINE]
    for ln in lines[2:2 + natoms]:
        toks = ln.split()
        elem = toks[0]
        nums = [_fix_number(t) for t in toks[1:5]]  # x y z [mulliken]
        out.append("\t".join([elem] + nums))
    return "\n".join(out) + "\n"


def convert_file(src: str, dst: str) -> None:
    with open(src, "r") as f:
        text = f.read()
    with open(dst, "w") as f:
        f.write(convert_text(text))


def convert_directory(src_dir: str, dst_dir: str) -> Dict[str, str]:
    """Convert every raw QM9 .xyz in ``src_dir`` into ``dst_dir``."""
    os.makedirs(dst_dir, exist_ok=True)
    written: Dict[str, str] = {}
    for fname in sorted(os.listdir(src_dir)):
        if not fname.endswith(".xyz"):
            continue
        src = os.path.join(src_dir, fname)
        dst = os.path.join(dst_dir, fname)
        convert_file(src, dst)
        written[src] = dst
    return written
