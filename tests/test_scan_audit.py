"""Source-audit unit tests: the audit must be green on the real tree
and must flag injected violations of each rule (unbounded toPandas,
global Window.orderBy outside the allowance, repartitionByRange inside
registered plans) — including the docstring/comment exclusions."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

from scan_audit import audit_source  # noqa: E402


def test_real_tree_is_clean():
    assert audit_source() == []


def _write(tmp_path, rel, content):
    path = tmp_path / rel
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(content)


def test_flags_unbounded_topandas(tmp_path):
    _write(tmp_path, "plans/x.py", "pdf = df.toPandas()\n")
    flags = audit_source(str(tmp_path))
    assert any("unbounded driver toPandas" in f for f in flags)
    # a slab-bounded collect in the same expression passes
    _write(tmp_path, "plans/x.py", "pdf = df.where(c < 1000).toPandas()\n")
    assert audit_source(str(tmp_path)) == []


def test_flags_global_window_outside_allowance(tmp_path):
    _write(
        tmp_path,
        "plans/new_pack.py",
        "from pyspark.sql import Window\nw = Window.orderBy('x')\n",
    )
    flags = audit_source(str(tmp_path))
    assert any("global Window.orderBy" in f for f in flags)


def test_partitioned_window_and_docstrings_not_flagged(tmp_path):
    _write(
        tmp_path,
        "plans/ok.py",
        '"""never write Window.orderBy or repartitionByRange here"""\n'
        "# Window.orderBy in a comment\n"
        "w = Window.partitionBy('k').orderBy('x')\n",
    )
    assert audit_source(str(tmp_path)) == []


def test_allowance_caps_per_file(tmp_path):
    # corpus_queries.py has a documented allowance of exactly 1
    body = "w1 = Window.orderBy('a')\nw2 = Window.orderBy('b')\n"
    _write(tmp_path, "plans/corpus_queries.py", body)
    flags = audit_source(str(tmp_path))
    assert any("exceed the documented allowance of 1" in f for f in flags)
    _write(tmp_path, "plans/corpus_queries.py", "w1 = Window.orderBy('a')\n")
    assert audit_source(str(tmp_path)) == []


def test_flags_repartition_by_range_in_plans_only(tmp_path):
    _write(tmp_path, "plans/y.py", "df = df.repartitionByRange(8, 'k')\n")
    _write(tmp_path, "operators/layout.py", "df = df.repartitionByRange(8, 'k')\n")
    flags = audit_source(str(tmp_path))
    assert len(flags) == 1 and "plans/y.py" in flags[0] and "repartitionByRange" in flags[0]


def test_flags_line_wrapped_global_window(tmp_path):
    # black/79-col style wraps the chain: `Window\n  .orderBy(...)` —
    # the tokenizer walk must skip NL/COMMENT tokens, not require
    # strict adjacency
    pkg = tmp_path / "pkg"
    pkg.mkdir()
    (pkg / "wrapped.py").write_text(
        "from pyspark.sql import Window\n"
        "w = (\n"
        "    Window\n"
        "    # a comment between the parts\n"
        "    .orderBy('x')\n"
        ")\n"
    )
    flags = audit_source(str(pkg))
    assert any("global Window.orderBy" in f for f in flags), flags
