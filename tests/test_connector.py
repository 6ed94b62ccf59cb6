"""Connector-level tests (reference: tests/test_connector.py)."""

import pytest

from lmcache_tpu.storage.connector import CreateConnector, parse_remote_url


def test_parse_remote_url():
    p = parse_remote_url("lm://host1:1234")
    assert p.connector_type == "lm"
    assert p.hosts_and_ports == [("host1", 1234)]
    p = parse_remote_url("redis-sentinel://h1:1,h2:2,h3:3")
    assert p.connector_type == "redis-sentinel"
    assert len(p.hosts_and_ports) == 3
    with pytest.raises(ValueError):
        parse_remote_url("not-a-url")
    with pytest.raises(ValueError):
        parse_remote_url("lm://host-no-port")
    with pytest.raises(ValueError):
        CreateConnector("lm://h1:1,h2:2")  # multi-host only for sentinel


@pytest.mark.parametrize("url_fn", [
    lambda info: "redis://localhost:6379",
    lambda info: "redis-sentinel://localhost:26379",
    lambda info: info.url,
])
def test_connector_ops(url_fn, lmserver_process, autorelease):
    connector = CreateConnector(url_fn(lmserver_process))
    autorelease(connector)
    key, value = "test-key@0@1@abc", b"\x01\x02\x03" * 100
    assert not connector.exists(key)
    connector.set(key, value)
    assert connector.exists(key)
    assert connector.get(key) == value
    assert connector.get("missing") in (None, b"")
    assert key in connector.list()


def test_lm_connector_large_payload(lmserver_process, autorelease):
    connector = autorelease(CreateConnector(lmserver_process.url))
    value = bytes(range(256)) * 40000  # ~10 MB
    connector.set("big", value)
    assert connector.get("big") == value


def test_lm_connector_ping(lmserver_process, autorelease):
    connector = autorelease(CreateConnector(lmserver_process.url))
    inner = getattr(connector, "_connector", connector)
    assert inner.ping()
