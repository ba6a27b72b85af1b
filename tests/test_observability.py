"""Telegram logger (mocked transport) and plotting smoke tests."""

import sys
import types
from os.path import exists

import numpy as np
import pytest

from hyperpocket_tpu.utils.telegram import TelegramLogger


@pytest.fixture
def fake_requests(monkeypatch):
    calls = []

    def post(url, data=None, files=None, timeout=None):
        calls.append({"url": url, "data": data, "files": files})
        return types.SimpleNamespace(status_code=200)

    mod = types.ModuleType("requests")
    mod.post = post
    monkeypatch.setitem(sys.modules, "requests", mod)
    return calls


def test_telegram_log_text(fake_requests):
    tg = TelegramLogger("token123", "chat456")
    tg.log("hello")
    assert len(fake_requests) == 1
    assert "bottoken123/sendMessage" in fake_requests[0]["url"]
    assert fake_requests[0]["data"]["text"] == "hello"


def test_telegram_log_images(fake_requests, tmp_path):
    paths = []
    for i in range(2):
        p = tmp_path / f"img{i}.png"
        p.write_bytes(b"fakepng")
        paths.append(str(p))
    tg = TelegramLogger("t", "c")
    tg.log_images(paths, caption="cap")
    assert len(fake_requests) == 1
    assert "sendMediaGroup" in fake_requests[0]["url"]
    assert len(fake_requests[0]["files"]) == 2


def test_telegram_swallows_errors(monkeypatch):
    mod = types.ModuleType("requests")

    def post(*a, **k):
        raise ConnectionError("no network")

    mod.post = post
    monkeypatch.setitem(sys.modules, "requests", mod)
    tg = TelegramLogger("t", "c")
    tg.log("must not raise")  # reference swallows all telegram errors
    tg.log_images(["/nonexistent.png"], "x")


def test_telegram_singleton():
    TelegramLogger._instance = None
    a = TelegramLogger.get_logger({"bot_token": "x", "chat_id": "y"})
    b = TelegramLogger.get_logger({"bot_token": "other", "chat_id": "z"})
    assert a is b
    TelegramLogger._instance = None


def test_save_plot_renders(tmp_path):
    from hyperpocket_tpu.utils.plotting import save_plot

    cloud = np.random.default_rng(0).standard_normal((3, 128)).astype(np.float32) * 0.2
    path = save_plot(cloud, epoch=3, k="airplane", results_dir=str(tmp_path), tag="val_rec")
    assert exists(path)
    assert path.endswith("3_airplane_val_rec.png")
    with open(path, "rb") as fh:
        assert fh.read(8).startswith(b"\x89PNG")
