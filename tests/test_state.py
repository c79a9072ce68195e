"""session_state: fingerprint-keyed staged-intermediate caching.

Covers the supersede path ADVICE r6 flagged: regenerating source data
mid-session must evict (and unpersist) the stale entry instead of
stranding its persisted blocks for the life of the session.
"""

from __future__ import annotations

from flirt_consume_spark.queries import base as qbase

SF = "/root/testdata/sf0.001"


class _FakeDF:
    def __init__(self) -> None:
        self.unpersisted = 0

    def unpersist(self) -> None:
        self.unpersisted += 1


def test_session_state_hit_and_evict(spark, monkeypatch):
    cache: dict = {}
    builds = []

    fp = {"v": "fp-1"}
    monkeypatch.setattr(
        "flirt_consume_spark.io.source_fingerprint",
        lambda sf_dir, name: fp["v"],
    )

    def build():
        df = _FakeDF()
        builds.append(df)
        return (df, [1, 2, 3])

    a = qbase.session_state(cache, spark, SF, ("orders",), build)
    b = qbase.session_state(cache, spark, SF, ("orders",), build)
    assert a is b and len(builds) == 1

    # Same scope, new fingerprint: the stale entry must be unpersisted
    # and dropped, and the builder must run again.
    fp["v"] = "fp-2"
    c = qbase.session_state(cache, spark, SF, ("orders",), build)
    assert c is not a and len(builds) == 2
    assert builds[0].unpersisted == 1
    assert len(cache) == 1

    # Distinct extra => distinct scope, no cross-eviction.
    d = qbase.session_state(cache, spark, SF, ("orders",), build, extra=(7,))
    assert d is not c and len(cache) == 2
    assert builds[1].unpersisted == 0


class _FakeCtx:
    def __init__(self, app_id: str) -> None:
        self.applicationId = app_id


class _FakeSpark:
    def __init__(self, app_id: str) -> None:
        self.sparkContext = _FakeCtx(app_id)


def test_session_state_two_sessions_no_collision(monkeypatch):
    """VERDICT r7 #7: two concurrent sessions (distinct appIds) and two
    sf_dirs sharing a basename must land in distinct cache scopes —
    no collision, and eviction in one scope must not unpersist the
    other's frames."""
    cache: dict = {}
    builds: list[_FakeDF] = []
    fps = {"/a/sfX": "fp-a", "/b/sfX": "fp-b"}
    monkeypatch.setattr(
        "flirt_consume_spark.io.source_fingerprint",
        lambda sf_dir, name: fps[sf_dir],
    )

    def build():
        df = _FakeDF()
        builds.append(df)
        return df

    s1, s2 = _FakeSpark("app-1"), _FakeSpark("app-2")
    # same basename, different parents: 4 distinct scopes
    a = qbase.session_state(cache, s1, "/a/sfX", ("orders",), build)
    b = qbase.session_state(cache, s1, "/b/sfX", ("orders",), build)
    c = qbase.session_state(cache, s2, "/a/sfX", ("orders",), build)
    d = qbase.session_state(cache, s2, "/b/sfX", ("orders",), build)
    assert len({id(x) for x in (a, b, c, d)}) == 4
    assert len(cache) == 4

    # Regenerate /a/sfX: both sessions' /a scopes rebuild on next
    # access, but the /b entries are untouched (no cross-eviction).
    fps["/a/sfX"] = "fp-a2"
    a2 = qbase.session_state(cache, s1, "/a/sfX", ("orders",), build)
    assert a2 is not a and a.unpersisted == 1
    assert b.unpersisted == 0 and c.unpersisted == 0 and d.unpersisted == 0
    # hits still serve without rebuild
    assert qbase.session_state(cache, s1, "/b/sfX", ("orders",), build) is b
    assert qbase.session_state(cache, s2, "/b/sfX", ("orders",), build) is d
    assert len(builds) == 5


def test_cache_path_distinct_for_same_basename(tmp_path):
    """Sink/round-trip paths derive from (basename, content
    fingerprint): two sf_dirs that share a basename but hold different
    data must map to different /tmp cache paths (ADVICE r6 sink_pyds
    class of bug, cross-session variant)."""
    import os

    from flirt_consume_spark.io import cache_path

    d1 = tmp_path / "p1" / "sfX"
    d2 = tmp_path / "p2" / "sfX"
    for d, payload in ((d1, b"alpha"), (d2, b"beta-longer")):
        os.makedirs(d)
        with open(d / "orders.parquet", "wb") as fh:
            fh.write(payload)
    p1 = cache_path("sink", str(d1), "orders")
    p2 = cache_path("sink", str(d2), "orders")
    assert p1 != p2


def test_cached_queries_isolate_across_sf_dirs(spark):
    """End-to-end cache isolation: the session-cached query keys
    (staged percentile selections, semdedup pair kernel) must return
    sf-correct results when one session queries TWO sf_dirs back and
    forth — a hit from the wrong scope would surface as a wrong row
    count or wrong values here."""
    from flirt_consume_spark.queries import REGISTRY
    from flirt_consume_spark.testing import check_key, duck_connect

    sfs = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    cons = {sf: duck_connect(sf) for sf in sfs}
    try:
        for key in (
            "agg_percentile",
            "agg_winsorize",
            "llm_semdedup",
            "audit_ks",  # shared _status_ecdf staged frame
            "audit_mannwhitney",
            "eval_pr_curve",  # shared _score_ecdf staged frame
            "eval_auc",
        ):
            # interleave: sf A, sf B, then sf A again (cache re-hit)
            for sf in (sfs[0], sfs[1], sfs[0]):
                res = check_key(spark, cons[sf], REGISTRY[key], sf)
                assert res["status"] == "OK", (key, sf, res)
    finally:
        for c in cons.values():
            c.close()
