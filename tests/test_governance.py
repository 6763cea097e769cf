"""Round-4 governance/analytics operators vs hand references:
association rules (operators/assoc.py), SCD2 history builds
(operators/scd.py), data-quality audits (operators/dq.py), and the
keyed snapshot diff (operators/snapdiff.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.assoc import association_rules
from osc_geo_h3grid_srv_spark.operators.dq import (audit_checks,
                                                   audit_foreign_key)
from osc_geo_h3grid_srv_spark.operators.scd import scd2_history
from osc_geo_h3grid_srv_spark.operators.snapdiff import snapshot_diff


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


# ---------------------------------------------------------------- assoc

def _baskets(spark):
    # u1: {a,b}, u2: {a,b,c}, u3: {a}, u4: {b,c} -> N=4,
    # n(a)=3 n(b)=3 n(c)=2, n(a,b)=2 n(a,c)=1 n(b,c)=2
    rows = [(1, "a"), (1, "b"), (1, "b"),  # dup collapses
            (2, "a"), (2, "b"), (2, "c"),
            (3, "a"), (4, "b"), (4, "c"), (4, None)]
    return spark.createDataFrame(rows, "ent long, item string")


def test_assoc_rules_hand_counts(spark):
    out = {(r.antecedent, r.consequent): r
           for r in association_rules(_baskets(spark), "ent",
                                      "item").collect()}
    assert len(out) == 6  # 3 unordered pairs x 2 directions
    ab = out[("a", "b")]
    assert ab.n_both == 2
    assert ab.support == round(2 / 4, 6)
    assert ab.confidence == round(2 / 3, 6)
    assert ab.lift == round((2 / 3) / (3 / 4), 6)
    # direction asymmetry: confidence differs, support/lift symmetric
    ca, ac = out[("c", "a")], out[("a", "c")]
    assert ca.confidence == round(1 / 2, 6)
    assert ac.confidence == round(1 / 3, 6)
    assert ca.support == ac.support and ca.lift == ac.lift


def test_assoc_rules_thresholds(spark):
    out = association_rules(_baskets(spark), "ent", "item",
                            min_pair_n=2).collect()
    assert {(r.antecedent, r.consequent) for r in out} == {
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}
    out2 = association_rules(_baskets(spark), "ent", "item",
                             min_support=0.6).collect()
    assert out2 == []  # max support is 0.5


def test_assoc_rules_validation(spark):
    with pytest.raises(ValueError):
        association_rules(_baskets(spark), "ent", "item",
                          min_support=1.5)
    with pytest.raises(ValueError):
        association_rules(_baskets(spark), "ent", "item", min_pair_n=0)


# ----------------------------------------------------------------- scd2

def _stream(spark, rows):
    return spark.createDataFrame(
        rows, "entity long, value string, ts timestamp")


def test_scd2_runs_and_intervals(spark):
    df = _stream(spark, [
        (1, "A", _ts(1)), (1, "A", _ts(2)), (1, "B", _ts(3)),
        (1, "A", _ts(4)),  # A recurs -> a NEW version, not a merge
        (2, "X", _ts(5))])
    out = sorted(scd2_history(df, "entity", "value", "ts").collect(),
                 key=lambda r: (r.entity, r.version))
    e1 = [r for r in out if r.entity == 1]
    assert [(r.value, r.version) for r in e1] == [
        ("A", 1), ("B", 2), ("A", 3)]
    # chained intervals: eff_to == next eff_from, final is open
    assert e1[0].eff_to_us == e1[1].eff_from_us
    assert e1[1].eff_to_us == e1[2].eff_from_us
    assert e1[2].eff_to_us is None and e1[2].is_current
    assert not e1[0].is_current and not e1[1].is_current
    e2 = [r for r in out if r.entity == 2]
    assert len(e2) == 1 and e2[0].is_current and e2[0].version == 1


def test_scd2_duplicate_ts_pinned(spark):
    # two values on one timestamp: version order pinned value-asc
    df = _stream(spark, [(1, "B", _ts(1)), (1, "A", _ts(1))])
    out = sorted(scd2_history(df, "entity", "value", "ts").collect(),
                 key=lambda r: r.version)
    assert [(r.value, r.version) for r in out] == [("A", 1), ("B", 2)]


def test_scd2_null_value_is_a_version(spark):
    df = _stream(spark, [(1, None, _ts(1)), (1, "A", _ts(2))])
    out = sorted(scd2_history(df, "entity", "value", "ts").collect(),
                 key=lambda r: r.version)
    assert [r.value for r in out] == [None, "A"]
    assert out[0].eff_to_us == out[1].eff_from_us


# ------------------------------------------------------------------- dq

def _orders(spark):
    return spark.createDataFrame(
        [(1, 10, "F", 5.0), (2, 10, "O", -1.0), (3, None, "Z", 2.0),
         (3, 99, "F", 1.0)],
        "ok long, ck long, st string, price double")


def test_audit_checks_per_family(spark):
    rep = {r.check: r for r in audit_checks(
        _orders(spark),
        not_null=["ck"], unique=["ok"],
        domain={"st": ["F", "O"]},
        predicate={"pos": F.col("price") > 0}).collect()}
    assert rep["not_null:ck"].violations == 1
    assert rep["unique:ok"].violations == 1  # ok=3 twice
    assert rep["domain:st"].violations == 1  # 'Z'
    assert rep["pos"].violations == 1  # -1.0
    assert all(r.total == 4 for r in rep.values())
    assert not any(r["pass"] for r in rep.values())


def test_audit_checks_clean_passes(spark):
    rep = audit_checks(_orders(spark).filter("ok = 1"),
                       not_null=["ck"], unique=["ok"]).collect()
    assert all(r["pass"] and r.violations == 0 for r in rep)


def test_audit_checks_requires_checks(spark):
    with pytest.raises(ValueError):
        audit_checks(_orders(spark))


def test_audit_foreign_key_orphans(spark):
    dim = spark.createDataFrame([(10,)], "ck long")
    r = audit_foreign_key(_orders(spark), "ck", dim, "ck").collect()[0]
    # ck=99 is the orphan; NULL ck is not (SQL FK semantics)
    assert r.violations == 1 and r.total == 3 and not r["pass"]


# ------------------------------------------------------------ snapdiff

def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, v double, s string")


def test_snapshot_diff_statuses(spark):
    old = _snap(spark, [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "c"),
                        (4, None, "d")])
    new = _snap(spark, [(1, 1.0, "a"),          # unchanged -> dropped
                        (2, 2.5, "b"),          # changed (value)
                        (4, None, "d"),         # NULL==NULL unchanged
                        (5, 5.0, "e")])         # added; 3 removed
    out = {r.k: r for r in snapshot_diff(
        old, new, ["k"], ["v", "s"]).collect()}
    assert set(out) == {2, 3, 5}
    assert out[2].status == "changed" and out[2].new_v == 2.5
    assert out[3].status == "removed" and out[3].new_v is None
    assert out[5].status == "added" and out[5].old_v is None


def test_snapshot_diff_null_vs_value_is_changed(spark):
    old = _snap(spark, [(1, None, "a")])
    new = _snap(spark, [(1, 1.0, "a")])
    out = snapshot_diff(old, new, ["k"], ["v", "s"]).collect()
    assert len(out) == 1 and out[0].status == "changed"


def test_snapshot_diff_validation(spark):
    df = _snap(spark, [(1, 1.0, "a")])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [], ["v"])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, ["k"], [])
