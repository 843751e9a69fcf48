"""S11 etcd config source (reference t/etcd.t: set/get roundtrip)."""

import dataclasses

import pytest

from loong_spark.config import CrawlConfig
from loong_spark.etcd import (
    ConfigSourceUnavailable,
    EtcdClient,
    FileConfigStore,
    KeyMissing,
    MemoryConfigStore,
    load_crawl_config,
)


@pytest.fixture(params=["file", "memory"])
def store(request, tmp_path):
    if request.param == "file":
        return FileConfigStore(tmp_path / "etcd")
    return MemoryConfigStore()


def test_set_get_roundtrip(store):
    # t/etcd.t roundtrips a nested structure through JSON encode/decode
    val = {"site": "hupu", "ua": {"max_active": 4, "interval": 2}, "seeds": ["a", "b"]}
    store.set("loong/site/hupu", val)
    assert store.get("loong/site/hupu") == val


def test_get_missing_key_raises(store):
    with pytest.raises(KeyMissing):
        store.get("loong/absent")


def test_update_read_modify_write(store):
    store.set("k", {"n": 1})
    store.update("k", lambda v: {**v, "n": v["n"] + 1})
    assert store.get("k") == {"n": 2}


def test_value_isolation(store):
    """Mutating a returned value must not mutate the store (JSON
    encode/decode boundary, like the reference's wire roundtrip)."""
    store.set("k", {"lst": [1]})
    store.get("k")["lst"].append(2)
    assert store.get("k") == {"lst": [1]}


def test_invalid_key_rejected(store):
    for bad in ["../escape", "a b", "k\n", ""]:
        with pytest.raises(ValueError):
            store.set(bad, 1)


def test_absolute_key_rejected(store, tmp_path):
    """A leading '/' would make Path(root) / key REPLACE the root
    (pathlib absolute-join), letting --config-key escape the store dir —
    keys are strictly relative."""
    evil = tmp_path / "evil"
    for bad in ["/" + str(evil), "/abs", "//x"]:
        with pytest.raises(ValueError, match="invalid config key"):
            store.set(bad, {"pwned": 1})
        with pytest.raises(ValueError, match="invalid config key"):
            store.get(bad)
    assert not (tmp_path / "evil.json").exists()


def test_file_store_nested_keys(tmp_path):
    s = FileConfigStore(tmp_path / "etcd")
    s.set("loong/site/jrs/crawl", {"interval": 3})
    assert s.get("loong/site/jrs/crawl") == {"interval": 3}


def test_load_crawl_config_overlay(store):
    store.set("loong/crawl", {"global_budget": 99, "n_shards": 4, "fetch_robots": True})
    cfg = load_crawl_config(store)
    assert cfg.global_budget == 99
    assert cfg.n_shards == 4
    assert cfg.fetch_robots is True
    # untouched knobs keep their defaults
    assert cfg.default_max_active == CrawlConfig().default_max_active


def test_load_crawl_config_missing_key_is_defaults(store):
    assert load_crawl_config(store, "nope") == CrawlConfig()


def test_load_crawl_config_unknown_key_raises(store):
    store.set("loong/crawl", {"glbal_budget": 1})
    with pytest.raises(ValueError, match="glbal_budget"):
        load_crawl_config(store)


def test_load_crawl_config_non_object_raises(store):
    store.set("loong/crawl", [1, 2])
    with pytest.raises(ValueError, match="JSON object"):
        load_crawl_config(store)


def test_loaded_config_is_frozen(store):
    store.set("loong/crawl", {"global_budget": 7})
    cfg = load_crawl_config(store)
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.global_budget = 8


def test_etcd_client_unreachable_is_clean():
    """No etcd in the sandbox: the client must fail with the gated
    error, never a raw socket traceback."""
    c = EtcdClient("127.0.0.1:1", timeout_s=0.2)
    with pytest.raises(ConfigSourceUnavailable, match="unreachable"):
        c.get("loong/crawl")
    with pytest.raises(ConfigSourceUnavailable):
        c.set("loong/crawl", {"a": 1})


def test_etcd_client_url_shape():
    c = EtcdClient("10.0.0.5:2379")
    assert c._url("loong/site/hupu") == "http://10.0.0.5:2379/v2/keys/loong/site/hupu"


def test_cli_crawl_config_store(capsys, spark, tmp_path):
    """S11 on the product surface: `crawl --config-store DIR` seeds the
    run's knobs from the stored JSON; explicit flags overlay it."""
    import json as _json

    from loong_spark import cli
    from loong_spark.etcd import FileConfigStore
    from loong_spark.pipeline import CrawlPipeline

    store = FileConfigStore(tmp_path / "cfgstore")
    store.set("loong/crawl", {"global_budget": 7, "log_requests": True})

    wh = str(tmp_path / "wh")
    rc = cli.main([
        "crawl", "--warehouse", wh, "--demo", "--max-batches", "2",
        "--config-store", str(tmp_path / "cfgstore"),
    ])
    assert rc == 0
    lines = [
        _json.loads(line)
        for line in capsys.readouterr().out.splitlines()
        if line.startswith('{"batch_id"')
    ]
    assert [m["batch_id"] for m in lines] == [1, 2]

    # bootstrap persisted the STORED knobs (+ the max-batches overlay)
    pipe = CrawlPipeline(spark, wh)
    assert pipe.cfg.global_budget == 7
    assert pipe.cfg.log_requests is True
    assert pipe.cfg.max_batches == 2
    # log_requests came from the store → the requests table exists
    assert pipe.store.exists("requests")


def test_cli_crawl_rerun_keeps_persisted_config(capsys, spark, tmp_path):
    """Re-running `crawl` on an existing warehouse must layer the
    persisted config.json as the BASE — knobs from the original run
    (log_requests here) must not silently reset to defaults when the
    re-run passes no flags."""
    import json as _json

    from loong_spark import cli
    from loong_spark.pipeline import CrawlPipeline

    wh = str(tmp_path / "wh")
    rc = cli.main([
        "crawl", "--warehouse", wh, "--demo", "--max-batches", "1",
        "--log-requests", "--budget", "9",
    ])
    assert rc == 0
    capsys.readouterr()

    # second invocation: NO flags — original knobs must survive
    rc = cli.main(["crawl", "--warehouse", wh, "--max-batches", "3"])
    assert rc == 0
    lines = [
        _json.loads(line)
        for line in capsys.readouterr().out.splitlines()
        if line.startswith('{"batch_id"')
    ]
    assert lines and lines[0]["batch_id"] == 2  # continued, not re-bootstrapped

    pipe = CrawlPipeline(spark, wh)
    assert pipe.cfg.log_requests is True
    assert pipe.cfg.global_budget == 9
    # and the re-run batches kept appending to the audit table
    reqs = pipe.store.read("requests").collect()
    assert {r.batch_id for r in reqs} >= {1, 2}
