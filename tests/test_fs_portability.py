"""r12: the pointer-commit family (snapshot MERGE sink + CDC feed,
persisted IVF index) must do ALL its pointer/prune I/O through the
Hadoop FileSystem wrappers in ``io.fs`` — Python ``os``/``shutil``/
``open`` only exist on a driver-local filesystem, the one thing a
1000-executor cluster reading 100 TB does not have (VERDICT r11 #1).
The guard is AST-based so a re-introduced local-only call fails the
suite even before any behavior test would notice.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "filmdatawarehouse_spark"

# the modules whose commit protocols target remote-capable table paths
PORTABLE_MODULES = [
    PKG / "streaming" / "merge.py",
    PKG / "operators" / "similarity.py",
    PKG / "operators" / "ivfpq.py",  # persisted IVF-PQ index (r12)
    PKG / "streaming" / "vector_ingest.py",  # IVF-PQ ingest ledger (r12)
    PKG / "io" / "fs.py",
    PKG / "io" / "lease.py",  # writer fence (r14) — same portability bar
    PKG / "io" / "sinks.py",  # compact_parquet swap (r12)
    PKG / "io" / "maintenance.py",  # the original Hadoop-FS precedent
]


def _banned_calls(path: pathlib.Path) -> list[str]:
    """Names of local-FS-only operations used anywhere in the module:
    any reference to the ``os`` or ``shutil`` modules (incl. ``os.path``)
    and any call of the ``open`` builtin."""
    tree = ast.parse(path.read_text())
    hits: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            mods = (
                [a.name for a in node.names]
                if isinstance(node, ast.Import)
                else [node.module or ""]
            )
            for m in mods:
                root = m.split(".")[0]
                if root in ("os", "shutil"):
                    hits.append(f"line {node.lineno}: import {m}")
        elif isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Name) and f.id == "open":
                hits.append(f"line {node.lineno}: open(...)")
    return hits


def test_pointer_commit_modules_use_no_local_fs_calls():
    for path in PORTABLE_MODULES:
        hits = _banned_calls(path)
        assert not hits, (
            f"{path.name} performs driver-local-only filesystem I/O — "
            f"route it through io.fs (Hadoop FileSystem): {hits}"
        )


def test_fs_primitives_roundtrip(spark, tmp_path):
    """The five primitives the pointer protocols need, through the JVM
    FileSystem against a real (local-scheme) path: atomic overwrite
    semantics, absent-path contracts, child-dir enumeration."""
    from filmdatawarehouse_spark.io import fs

    root = str(tmp_path / "tbl")
    ptr = f"{root}/_LATEST"

    assert fs.read_text(spark, ptr) is None  # absent: None, not raise
    assert not fs.exists(spark, root)
    assert fs.list_child_dirs(spark, root) == []

    fs.mkdirs(spark, f"{root}/v-a")
    fs.mkdirs(spark, f"{root}/v-b")
    fs.write_text_atomic(spark, f"{root}/afile", "x")  # file, not dir
    assert fs.is_dir(spark, f"{root}/v-a")
    assert not fs.is_dir(spark, f"{root}/afile")
    assert fs.list_child_dirs(spark, root) == ["v-a", "v-b"]

    # first write, then atomic OVERWRITE of an existing pointer —
    # multi-line content (the two-line snapshot-pair format) intact
    fs.write_text_atomic(spark, ptr, "v-a")
    assert fs.read_text(spark, ptr) == "v-a"
    fs.write_text_atomic(spark, ptr, "v-b\nv-a")
    assert fs.read_text(spark, ptr) == "v-b\nv-a"
    # no temp file leaked next to the pointer
    leftovers = [
        d for d in tmp_path.joinpath("tbl").iterdir()
        if d.name.startswith("_LATEST.")
    ]
    assert leftovers == []

    assert fs.delete(spark, f"{root}/v-a")
    assert not fs.exists(spark, f"{root}/v-a")
    assert not fs.delete(spark, f"{root}/v-a")  # already gone: False
    assert fs.list_child_dirs(spark, root) == ["v-b"]
