"""Wire-protocol frame round trips (reference: tests/test_protocol.py)."""

import pytest

from lmcache_tpu.protocol import (REQUEST_HEADER_SIZE, RESPONSE_HEADER_SIZE,
                                  Code, Command, RequestHeader,
                                  ResponseHeader)


def test_request_header_roundtrip():
    key = "vllm@model@8@3@" + "ab" * 32
    hdr = RequestHeader(Command.PUT, key, payload_length=12345)
    packed = hdr.pack()
    assert len(packed) == REQUEST_HEADER_SIZE + len(key.encode())
    command, key_len, payload_len = RequestHeader.unpack_fixed(
        packed[:REQUEST_HEADER_SIZE])
    assert command == Command.PUT
    assert key_len == len(key.encode())
    assert payload_len == 12345
    assert packed[REQUEST_HEADER_SIZE:].decode() == key


def test_response_header_roundtrip():
    for code in (Code.OK, Code.FAIL, Code.NOT_FOUND):
        packed = ResponseHeader(code, 999).pack()
        assert len(packed) == RESPONSE_HEADER_SIZE
        hdr = ResponseHeader.unpack(packed)
        assert hdr.code == code
        assert hdr.payload_length == 999


def test_unicode_key():
    key = "vllm@org/model-名前@1@0@deadbeef"
    hdr = RequestHeader(Command.GET, key)
    packed = hdr.pack()
    _, key_len, _ = RequestHeader.unpack_fixed(packed[:REQUEST_HEADER_SIZE])
    assert packed[REQUEST_HEADER_SIZE:REQUEST_HEADER_SIZE +
                  key_len].decode("utf-8") == key


def test_bad_magic_rejected():
    bad = b"\x00" * REQUEST_HEADER_SIZE
    with pytest.raises(ValueError):
        RequestHeader.unpack_fixed(bad)
    with pytest.raises(ValueError):
        ResponseHeader.unpack(b"\x00" * RESPONSE_HEADER_SIZE)


def test_mexist_dispatch():
    """Server answers MEXIST with one presence byte per key."""
    from lmcache_tpu.protocol import Code, Command
    from lmcache_tpu.server import LMCacheServer
    srv = LMCacheServer("localhost", 0, "cpu")
    srv.storage.put("k1", b"a")
    srv.storage.put("k3", b"c")
    code, body = srv._dispatch(Command.MEXIST, "", b"k1\nk2\nk3")
    assert code == Code.OK
    assert body == b"\x01\x00\x01"
    code, body = srv._dispatch(Command.MEXIST, "", b"")
    assert code == Code.OK and body == b""
