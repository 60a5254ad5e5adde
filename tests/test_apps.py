"""CLI transcriber + websocket server end-to-end tests (reference analogues:
python/example/test_ffmpeg.py, test_srt.py, and the vosk-server protocol
client in transcriber.py:51-72)."""
import asyncio
import json
import os
import sys

import numpy as np
import pytest

import vosk_tpu
from vosk_tpu.io.wav import write_wav
from vosk_tpu.utils import toydata

TOY_DIR = "/tmp/vosk_tpu_toy_model_v1"


@pytest.fixture(scope="module")
def model_dir():
    if not os.path.exists(os.path.join(TOY_DIR, "vosk_tpu_model.json")):
        toydata.build_toy_model(TOY_DIR, train_steps=400)
    return TOY_DIR


@pytest.fixture(scope="module")
def wav_file(model_dir, tmp_path_factory):
    p = tmp_path_factory.mktemp("audio") / "test.wav"
    wav = toydata.make_test_wav(["one", "five", "zero"], seed=42)
    write_wav(p, wav, 16000)
    return str(p)


def run_cli(argv):
    from vosk_tpu.transcriber import cli

    old = sys.argv
    sys.argv = ["vosk-transcriber"] + argv
    try:
        cli.main()
    finally:
        sys.argv = old


def test_cli_txt(model_dir, wav_file, tmp_path, capsys):
    out = tmp_path / "out.txt"
    run_cli(["-m", model_dir, "-i", wav_file, "-o", str(out), "-t", "txt"])
    text = out.read_text().strip()
    assert text == "one five zero"


def test_cli_srt(model_dir, wav_file, tmp_path):
    out = tmp_path / "out.srt"
    run_cli(["-m", model_dir, "-i", wav_file, "-o", str(out), "-t", "srt"])
    content = out.read_text()
    assert "-->" in content
    assert "one five zero" in content.replace("\n", " ")


def test_cli_webvtt(model_dir, wav_file, tmp_path):
    out = tmp_path / "out.vtt"
    run_cli(["-m", model_dir, "-i", wav_file, "-o", str(out), "-t", "webvtt"])
    content = out.read_text()
    assert content.startswith("WEBVTT")
    assert "-->" in content and "." in content.split("-->")[0]
    assert "one five zero" in content.replace("\n", " ")


def test_cli_directory(model_dir, wav_file, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    import shutil

    shutil.copy(wav_file, in_dir / "a.wav")
    shutil.copy(wav_file, in_dir / "b.wav")
    out_dir = tmp_path / "out"
    run_cli(["-m", model_dir, "-i", str(in_dir), "-o", str(out_dir), "-t", "txt"])
    assert (out_dir / "a.txt").read_text().strip() == "one five zero"
    assert (out_dir / "b.txt").read_text().strip() == "one five zero"


def test_cli_server_mode(model_dir, wav_file, tmp_path):
    """CLI --server mode against a live ws server (reference
    transcriber.py:51-72 client protocol)."""
    import threading

    from vosk_tpu.server import wsproto
    from vosk_tpu.server.ws import ASRServer

    port_holder = {}

    def serve():
        async def run():
            model = vosk_tpu.Model(model_dir)
            srv = ASRServer(model)
            server = await wsproto.serve(srv.handle, "127.0.0.1", 0)
            port_holder["port"] = server.sockets[0].getsockname()[1]
            port_holder["loop"] = asyncio.get_running_loop()
            async with server:
                try:
                    await server.serve_forever()
                except asyncio.CancelledError:
                    pass

        asyncio.run(run())

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    for _ in range(100):
        if "port" in port_holder:
            break
        import time

        time.sleep(0.1)
    port = port_holder["port"]

    out = tmp_path / "server_out.txt"
    run_cli(
        [
            "-i", wav_file, "-o", str(out), "-t", "txt",
            "--server", f"ws://127.0.0.1:{port}", "--tasks", "1",
        ]
    )
    assert out.read_text().strip() == "one five zero"


def test_ws_server_roundtrip(model_dir):
    """Full protocol: config -> chunks -> eof over a real socket."""
    from vosk_tpu.server import wsproto
    from vosk_tpu.server.ws import ASRServer

    async def run():
        model = vosk_tpu.Model(model_dir)
        srv = ASRServer(model)
        server = await wsproto.serve(srv.handle, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]

        wav = toydata.make_test_wav(["seven", "two"], seed=77)
        pcm = np.clip(wav, -32768, 32767).astype("<i2").tobytes()

        results = []
        async with wsproto.connect(f"ws://127.0.0.1:{port}") as ws:
            await ws.send('{ "config" : { "sample_rate" : 16000.0, "words": true } }')
            for i in range(0, len(pcm), 8000):
                await ws.send(pcm[i : i + 8000])
                results.append(json.loads(await ws.recv()))
            await ws.send('{"eof" : 1}')
            results.append(json.loads(await ws.recv()))
        server.close()
        await server.wait_closed()
        return results

    results = asyncio.run(run())
    finals = [r for r in results if "text" in r]
    assert finals, results
    text = " ".join(r["text"] for r in finals if r["text"]).strip()
    assert text == "seven two"
    assert any("result" in r for r in finals)  # words enabled via config
