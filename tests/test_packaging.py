"""The spark-submit deployment artifact must not drift from the tree.

dist/karta_spark.zip is what `spark-submit --py-files` actually executes
on a cluster; a stale zip means the deployed engine silently differs from
the tested one (this bit us once: an old knn.py in the zip crashed on the
new zoom=None default while every local test passed).
"""

import os
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(ROOT, "dist", "karta_spark.zip")


def test_pyfiles_zip_matches_tree():
    assert os.path.exists(ZIP), "dist/karta_spark.zip missing — run scripts/make_pyfiles.sh"
    with zipfile.ZipFile(ZIP) as z:
        names = set(z.namelist())
        stale, missing = [], []
        for dirpath, _, files in os.walk(os.path.join(ROOT, "karta_spark")):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, ROOT)
                if arc not in names:
                    missing.append(arc)
                    continue
                with open(full, "rb") as f:
                    if z.read(arc) != f.read():
                        stale.append(arc)
    assert not missing, f"files absent from the zip: {missing} — run scripts/make_pyfiles.sh"
    assert not stale, f"zip entries differ from the tree: {stale} — run scripts/make_pyfiles.sh"


def test_gate_query_count_matches_readme():
    """The README's 'NN gate queries' claim and the entry registry can't
    silently drift apart (VERDICT r3 item 8), and every queries() entry
    has its DuckDB oracle twin (the driver's value gate)."""
    import importlib.util
    import re

    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(ROOT, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()
    o = mod.oracle_sql()
    assert set(o) <= set(q), f"oracle keys without queries: {set(o) - set(q)}"
    assert set(q) == set(o), \
        f"rows-only queries (no oracle twin): {sorted(set(q) - set(o))}"
    with open(os.path.join(ROOT, "README.md")) as f:
        m = re.search(r"(\d+) gate\s+queries", f.read())
    assert m, "README no longer states the gate-query count"
    assert int(m.group(1)) == len(q), \
        f"README says {m.group(1)} gate queries but queries() has {len(q)}"
