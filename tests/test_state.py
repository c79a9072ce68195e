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
