"""Model-zoo resolver (name/lang -> URL -> cache) against a faked
transport — the reference's auto-download logic
(python/vosk/__init__.py:61-121) gated behind VOSK_TPU_ALLOW_DOWNLOAD
because the build image has zero egress."""
import io
import json
import os
import zipfile

import pytest

import vosk_tpu


MODELS = [
    {"name": "vosk-model-small-en-us-0.15", "lang": "en-us",
     "type": "small", "obsolete": "false"},
    {"name": "vosk-model-en-us-0.22", "lang": "en-us",
     "type": "big", "obsolete": "false"},
    {"name": "vosk-model-small-de-0.15", "lang": "de",
     "type": "small", "obsolete": "false"},
    {"name": "vosk-model-small-en-us-0.3", "lang": "en-us",
     "type": "small", "obsolete": "true"},
]


class FakeResponse(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def fake_urlopen(url):
    assert url == vosk_tpu.MODEL_LIST_URL
    return FakeResponse(json.dumps(MODELS).encode())


def make_fake_urlretrieve(calls):
    def fake_urlretrieve(url, dst):
        calls.append(url)
        name = url.rsplit("/", 1)[1][: -len(".zip")]
        with zipfile.ZipFile(dst, "w") as z:
            z.writestr(f"{name}/vosk_tpu_model.json", "{}")
    return fake_urlretrieve


def test_list_models_parses():
    models = vosk_tpu.list_models(urlopen=fake_urlopen)
    assert models[0]["name"] == "vosk-model-small-en-us-0.15"


def test_resolver_by_name_downloads_and_caches(tmp_path, monkeypatch):
    monkeypatch.setitem(
        os.environ, "VOSK_MODEL_PATH", str(tmp_path))
    monkeypatch.setattr(vosk_tpu, "MODEL_DIRS", [str(tmp_path)])
    calls = []
    p = vosk_tpu._download_model(
        model_name="vosk-model-en-us-0.22",
        urlopen=fake_urlopen, urlretrieve=make_fake_urlretrieve(calls))
    assert p is not None and p.name == "vosk-model-en-us-0.22"
    assert (p / "vosk_tpu_model.json").exists()
    assert calls == [vosk_tpu.MODEL_PRE_URL + "vosk-model-en-us-0.22.zip"]
    # second resolve hits the cache, no transport
    p2 = vosk_tpu._download_model(
        model_name="vosk-model-en-us-0.22",
        urlopen=fake_urlopen, urlretrieve=make_fake_urlretrieve(calls))
    assert p2 == p and len(calls) == 1


def test_resolver_by_lang_picks_small_non_obsolete(tmp_path, monkeypatch):
    monkeypatch.setattr(vosk_tpu, "MODEL_DIRS", [str(tmp_path)])
    calls = []
    p = vosk_tpu._download_model(
        lang="en-us", urlopen=fake_urlopen,
        urlretrieve=make_fake_urlretrieve(calls))
    # smallest non-obsolete en-us model, NOT the big or obsolete ones
    assert p.name == "vosk-model-small-en-us-0.15"


def test_resolver_unknown_name_returns_none(tmp_path, monkeypatch):
    monkeypatch.setattr(vosk_tpu, "MODEL_DIRS", [str(tmp_path)])
    assert vosk_tpu._download_model(
        model_name="no-such-model", urlopen=fake_urlopen,
        urlretrieve=make_fake_urlretrieve([])) is None


def test_resolution_disabled_without_flag(tmp_path, monkeypatch):
    monkeypatch.setattr(vosk_tpu, "MODEL_DIRS", [str(tmp_path)])
    monkeypatch.delenv("VOSK_TPU_ALLOW_DOWNLOAD", raising=False)
    with pytest.raises(Exception, match="downloads are disabled"):
        vosk_tpu._resolve_model_path(model_name="vosk-model-en-us-0.22")
