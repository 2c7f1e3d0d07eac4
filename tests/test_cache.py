"""Tracked-persist lifecycle: track/release_all and the scope()
contextmanager (ADVICE r4: looping callers release automatically)."""

from ml4logs_spark import cache


def test_scope_releases_only_its_own(spark):
    # clean baseline: earlier tests may legitimately leave tracked
    # persists (oracle-gate queries cache fit state); this test counts
    # exactly, so it must not depend on collection order
    cache.release_all()
    outer = cache.track(spark.range(10))
    outer.count()
    assert outer.storageLevel.useMemory
    with cache.scope():
        inner = cache.track(spark.range(20))
        inner.count()
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory  # scope freed its addition
    assert outer.storageLevel.useMemory      # pre-scope cache survives
    assert cache.release_all() == 1          # exactly the outer one left
    assert not outer.storageLevel.useMemory


def test_scope_releases_on_exception(spark):
    try:
        with cache.scope():
            df = cache.track(spark.range(5))
            df.count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not df.storageLevel.useMemory
    assert cache.release_all() == 0


def test_nested_scopes(spark):
    with cache.scope():
        a = cache.track(spark.range(3))
        a.count()
        with cache.scope():
            b = cache.track(spark.range(4))
            b.count()
        assert not b.storageLevel.useMemory
        assert a.storageLevel.useMemory
    assert not a.storageLevel.useMemory
