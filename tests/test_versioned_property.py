"""Model-based property test for the versioned store: a random
sequence of append/overwrite/merge/delete/rollback/checkpoint ops is
applied both to the real txlog table and to a trivial in-memory model
(a dict of key->row per version); after every op the live snapshot
must equal the model, and a random historical version must replay
exactly. This is the test shape transaction logs earn trust with —
the unit tests pin scenarios, this pins the ALGEBRA.
"""
from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from aws_glue_data_catalog_replication_utility_spark import versioned as V

KEYS = list(range(12))


def _op_strategy():
    row = st.tuples(
        st.sampled_from(KEYS), st.integers(min_value=0, max_value=99)
    )
    rows = st.lists(row, min_size=1, max_size=6)
    return st.lists(
        st.one_of(
            st.tuples(st.just("append"), rows),
            st.tuples(st.just("overwrite"), rows),
            st.tuples(st.just("merge"), rows),
            st.tuples(st.just("delete_mod"), st.integers(2, 5)),
            # merge-on-read twin of delete_mod: same model semantics,
            # different physical mechanism (deletion vectors)
            st.tuples(st.just("delete_dv_mod"), st.integers(2, 5)),
            st.tuples(
                st.just("update_mod"),
                st.tuples(st.integers(2, 5), st.integers(1, 9)),
            ),
            st.tuples(st.just("purge_dvs"), st.just(0)),
            st.tuples(st.just("rollback"), st.integers(0, 100)),
            st.tuples(st.just("checkpoint"), st.just(0)),
        ),
        min_size=3,
        max_size=10,
    )


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["posix-link", "conditional-put"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_op_strategy())
def test_versioned_store_matches_model(spark, tmp_path_factory, backend, ops):
    root = str(tmp_path_factory.mktemp("prop") / "t")
    store = (
        V.PosixLinkLogStore()
        if backend == "posix-link"
        else V.ConditionalPutLogStore()
    )
    prev = V.set_log_store(store)
    try:
        _run_model(spark, root, ops)
    finally:
        V.set_log_store(prev)


def _run_model(spark, root, ops):

    def mk(rows):
        # duplicate keys inside one batch are allowed for append but
        # would make merge nondeterministic — dedup keeping the last
        return spark.createDataFrame(rows, "k int, v int")

    def snap_of(df):
        return sorted((r.k, r.v) for r in df.collect())

    model_versions: list[list[tuple[int, int]]] = []  # version -> rows
    cur: list[tuple[int, int]] = []
    started = False

    for kind, arg in ops:
        if not started and kind in (
            "merge", "delete_mod", "delete_dv_mod", "update_mod",
            "purge_dvs", "rollback", "checkpoint",
        ):
            continue  # table doesn't exist yet
        if kind == "append":
            V.append(mk(arg), root)
            cur = cur + list(arg)
        elif kind == "overwrite":
            V.overwrite(mk(arg), root)
            cur = list(arg)
        elif kind == "merge":
            dedup = list({k: (k, v) for k, v in arg}.values())
            V.merge_into(spark, root, mk(dedup), ["k"])
            keys = {k for k, _ in dedup}
            cur = [r for r in cur if r[0] not in keys] + dedup
        elif kind in ("delete_mod", "delete_dv_mod"):
            mode = "dv" if kind == "delete_dv_mod" else "rewrite"
            v = V.delete_where(spark, root, f"k % {arg} = 0", mode=mode)
            had_match = any(r[0] % arg == 0 for r in cur)
            cur = [r for r in cur if r[0] % arg != 0]
            # a no-match delete adds no version (either mode)
            if not had_match:
                assert v == len(model_versions)
                started = True
                assert snap_of(V.read_versioned(spark, root)) == sorted(cur)
                continue
        elif kind == "update_mod":
            m, delta = arg
            v = V.update_where(
                spark, root, f"k % {m} = 0", {"v": f"v + {delta}"}
            )
            had_match = any(r[0] % m == 0 for r in cur)
            cur = [
                (k, vv + delta if k % m == 0 else vv) for k, vv in cur
            ]
            if not had_match:
                assert v == len(model_versions)
                started = True
                assert snap_of(V.read_versioned(spark, root)) == sorted(cur)
                continue
        elif kind == "purge_dvs":
            v = V.optimize(spark, root, purge_dvs=True)
            if v == len(model_versions):  # no live mask: no version
                assert snap_of(V.read_versioned(spark, root)) == sorted(cur)
                continue
            assert v == len(model_versions) + 1  # content unchanged
        elif kind == "rollback":
            to = (arg % len(model_versions)) + 1
            V.rollback(spark, root, to)
            cur = list(model_versions[to - 1])
        elif kind == "checkpoint":
            V.checkpoint(root)
            assert snap_of(V.read_versioned(spark, root)) == sorted(cur)
            continue  # no new version
        started = True
        model_versions.append(list(cur))
        assert snap_of(V.read_versioned(spark, root)) == sorted(cur)

    if not model_versions:
        return
    # replay a mid-history version exactly
    probe = (len(model_versions) + 1) // 2
    assert snap_of(V.read_versioned(spark, root, probe)) == sorted(
        model_versions[probe - 1]
    )
    # history length == number of committed versions
    assert len(V.history(root)) == len(model_versions)


_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s.upper() not in ("AND", "TRUE", "FALSE", "IS", "NOT", "NULL")
)
_op = st.sampled_from(["=", "<", "<=", ">", ">="])
_lit = st.one_of(
    st.integers(min_value=-10**12, max_value=10**12),
    st.floats(
        allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
    ).filter(lambda f: f != int(f)),  # integral floats render as ints
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00"
        ),
        max_size=12,
    ),
    st.booleans(),
)


def _render(col, op, val):
    if isinstance(val, bool):
        lit = "true" if val else "false"
    elif isinstance(val, str):
        lit = "'" + val.replace("'", "''") + "'"
    else:
        lit = repr(val)
    return f"{col} {op} {lit}"


@given(
    st.lists(st.tuples(_ident, _op, _lit), min_size=1, max_size=4)
)
@settings(max_examples=200, deadline=None)
def test_parse_conjuncts_round_trip(triples):
    """Render -> parse is the identity over the whole supported
    grammar: whatever the pruner is handed is EXACTLY what the SQL
    string says (a parser that mis-reads a literal would prune files
    the predicate matches — silent wrong results). Strings containing
    ' AND ' are the documented conservative give-up (None)."""
    sql = " AND ".join(_render(*t) for t in triples)
    got = V._parse_conjuncts(sql)
    if any(
        isinstance(v, str) and " and " in v.lower() for _, _, v in triples
    ):
        # split-on-AND cannot see quote context: must refuse, not lie
        assert got is None or got == list(triples)
        return
    assert got == [
        (c, o, v) for c, o, v in triples
    ], sql
