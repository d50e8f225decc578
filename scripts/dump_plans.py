#!/usr/bin/env python
"""Dump .explain("formatted") for named ``__spark_entry__.queries()``
entries to ``plans/<outdir>/<name>_<suffix>.txt``.

Usage: dump_plans.py <repo_root> <sf_dir> <out_dir> <suffix> <query> [...]

Used to produce the ``plans/r07/*_{before,after}.txt`` evidence files:
point <repo_root> at a round-start worktree for the "before" dumps and
at the live tree for "after".
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path


def main() -> None:
    repo_root, sf_dir, out_dir, suffix = sys.argv[1:5]
    names = sys.argv[5:]
    sys.path.insert(0, repo_root)

    import __spark_entry__ as E
    from legal_text_retrieval_spark.session import get_spark

    spark = get_spark(app_name="lts-dump-plans")
    qs = E.queries()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {out / f'{name}_{suffix}.txt'} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
