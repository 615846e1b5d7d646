"""__spark_entry__._DF_CACHE is bounded (VERDICT r8 #4 nit): a long-lived
process cycling (session, sf_dir) contexts must not grow the compiled-plan
memo without limit — LRU eviction caps it at _DF_CACHE_MAX."""


def test_df_cache_bounded_across_context_cycles():
    import __spark_entry__ as e

    calls = []

    @e._register("__test_cache_probe", None)
    def probe(spark, sf_dir):  # noqa: ANN001 — mirrors the registry signature
        calls.append(sf_dir)
        return object()

    fn = e._QUERIES["__test_cache_probe"]
    before = dict(e._DF_CACHE)
    try:
        e._DF_CACHE.clear()
        for i in range(e._DF_CACHE_MAX + 64):
            fn(object(), f"/tmp/__cache_probe_sf{i}")
        assert len(e._DF_CACHE) <= e._DF_CACHE_MAX
        # memo hit: the same (session, sf_dir) returns the cached object
        # without re-invoking the builder
        s = object()
        n = len(calls)
        a = fn(s, "/tmp/__cache_probe_hit")
        b = fn(s, "/tmp/__cache_probe_hit")
        assert a is b and len(calls) == n + 1
        # LRU: a fresh hit refreshes recency — after filling past the cap,
        # the just-hit key survives while older untouched keys evicted
        for i in range(e._DF_CACHE_MAX - 1):
            fn(object(), f"/tmp/__cache_probe_refill{i}")
        assert fn(s, "/tmp/__cache_probe_hit") is a
    finally:
        del e._QUERIES["__test_cache_probe"]
        e._DF_CACHE.clear()
        e._DF_CACHE.update(before)
