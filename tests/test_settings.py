"""Settings semantics (reference ``lotus/settings.py`` +
``tests/test_settings.py``): global baseline via assignment/configure,
contextvar-scoped ``override`` with nesting, exception restore, and
thread / asyncio-task isolation."""

import asyncio
import threading

import pytest

from lotus_spark.session import Settings, settings


@pytest.fixture()
def s():
    return Settings()


def test_initial_values_and_configure(s):
    assert s.lm is None and s.enable_cache is False
    assert s.serialization_format == "default"
    s.configure(enable_cache=True, serialization_format="json")
    assert s.enable_cache is True and s.serialization_format == "json"
    with pytest.raises(ValueError, match="unknown setting"):
        s.configure(bogus=1)
    with pytest.raises(ValueError, match="unknown setting"):
        with s.override(bogus=1):
            pass


def test_plain_assignment_writes_global_baseline(s):
    s.safe_mode = True
    assert s.safe_mode is True
    assert Settings().safe_mode is False  # instance-scoped baselines


def test_override_nests_and_restores_on_exception(s):
    with s.override(serialization_format="json"):
        assert s.serialization_format == "json"
        with s.override(serialization_format="xml"):
            assert s.serialization_format == "xml"
        assert s.serialization_format == "json"
    assert s.serialization_format == "default"

    with pytest.raises(RuntimeError):
        with s.override(enable_cache=True):
            raise RuntimeError
    assert s.enable_cache is False


def test_override_thread_isolation():
    """Two threads inside override() simultaneously see only their own
    values (reference tests/test_settings.py:101-120); baseline
    untouched after both exit."""
    results = {}
    barrier = threading.Barrier(2)

    def run(tid, value):
        with settings.override(enable_cache=value):
            barrier.wait()
            results[tid] = settings.enable_cache

    ts = [threading.Thread(target=run, args=(1, True)),
          threading.Thread(target=run, args=(2, False))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results == {1: True, 2: False}
    assert settings.enable_cache is False


def test_override_asyncio_task_isolation():
    """Concurrent asyncio tasks see only their own overrides (reference
    tests/test_settings.py:138+)."""

    async def task(v):
        with settings.override(enable_cache=v):
            await asyncio.sleep(0.01)
            return settings.enable_cache

    async def main():
        return await asyncio.gather(task(True), task(False))

    assert asyncio.run(main()) == [True, False]


def test_clone_captures_effective_values(s):
    with s.override(serialization_format="xml"):
        c = s.clone()
    assert c.serialization_format == "xml"   # effective at clone time
    assert s.serialization_format == "default"


def test_cluster_conf_sizing_arithmetic():
    from lotus_spark.deploy import cluster_conf

    # 1000 executors x 4 cores, 100 TB input
    c = cluster_conf(4000, input_bytes=100 * (1 << 40))
    parts = int(c["spark.sql.shuffle.partitions"])
    assert parts == (100 * (1 << 40)) // (128 << 20)  # data-driven: ~800k
    assert c["spark.sql.adaptive.coalescePartitions.initialPartitionNum"] == str(parts)
    # small job: core-driven floor wins
    c2 = cluster_conf(4000)
    assert int(c2["spark.sql.shuffle.partitions"]) == 8000
    # tiny cluster: absolute floor
    assert int(cluster_conf(1)["spark.sql.shuffle.partitions"]) == 32
    # knobs present and AQE on
    for k in ("spark.sql.adaptive.enabled",
              "spark.sql.adaptive.skewJoin.enabled"):
        assert c[k] == "true"
    import pytest

    with pytest.raises(ValueError):
        cluster_conf(0)


def test_apply_cluster_conf_folds_into_builder():
    from pyspark.sql import SparkSession

    from lotus_spark.deploy import apply_cluster_conf, cluster_conf

    b = SparkSession.builder
    b2 = apply_cluster_conf(b, cluster_conf(8))
    assert b2 is not None  # builder accepts every key (no typos/raises)
