"""Transcription engine behind the `vosk-transcriber` CLI — behavior parity
with the reference (python/vosk/transcriber/transcriber.py): ffmpeg decode of
arbitrary media to 16 kHz s16le, 4000-byte streaming chunks, thread-pool
parallel file processing, txt/srt output, xRT timing logs, optional
websocket-server mode.

Differences: WAV files are read natively (no ffmpeg needed); srt composition
is inlined (no external srt package).
"""
from __future__ import annotations

import datetime
import json
import logging
import shlex
import shutil
import subprocess
from multiprocessing.dummy import Pool
from pathlib import Path
from queue import Queue
from timeit import default_timer as timer

CHUNK_SIZE = 4000
SAMPLE_RATE = 16000.0


def _srt_timestamp(seconds: float) -> str:
    td = datetime.timedelta(seconds=max(seconds, 0.0))
    total = int(td.total_seconds())
    ms = int((td.total_seconds() - total) * 1000)
    h, rem = divmod(total, 3600)
    m, s = divmod(rem, 60)
    return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"


def compose_srt(subtitles) -> str:
    """subtitles: list of (start_s, end_s, text)."""
    out = []
    for i, (start, end, text) in enumerate(subtitles, 1):
        out.append(f"{i}\n{_srt_timestamp(start)} --> {_srt_timestamp(end)}\n{text}\n")
    return "\n".join(out)


def compose_webvtt(subtitles) -> str:
    """WebVTT composer (reference examples emit webvtt via the webvtt-py
    package; composed inline here like srt)."""
    out = ["WEBVTT", ""]
    for start, end, text in subtitles:
        ts = lambda s: _srt_timestamp(s).replace(",", ".")
        out.append(f"{ts(start)} --> {ts(end)}\n{text}\n")
    return "\n".join(out)


class Transcriber:
    def __init__(self, args):
        self.args = args
        self.model = None
        if getattr(args, "server", None) is None:
            import vosk_tpu

            self.model = vosk_tpu.Model(
                model_path=args.model, model_name=args.model_name, lang=args.lang
            )

    # ------------------------------------------------------------ input

    def _audio_stream(self, infile):
        """Returns a file-like with .read(n) yielding s16le mono 16 kHz."""
        path = Path(infile)
        if shutil.which("ffmpeg"):
            cmd = shlex.split(
                f'ffmpeg -nostdin -loglevel quiet -i "{infile}" '
                f"-ar {SAMPLE_RATE} -ac 1 -f s16le -"
            )
            proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
            return proc.stdout
        if path.suffix.lower() == ".wav":
            import io

            import numpy as np

            from ..io.wav import read_wav

            data, rate = read_wav(path)
            if rate != SAMPLE_RATE:
                n_out = int(round(len(data) * SAMPLE_RATE / rate))
                x = np.arange(n_out) * (rate / SAMPLE_RATE)
                data = np.interp(x, np.arange(len(data)), data)
            pcm = np.clip(data, -32768, 32767).astype("<i2").tobytes()
            return io.BytesIO(pcm)
        raise RuntimeError(
            f"Cannot decode '{infile}': ffmpeg not found and file is not WAV"
        )

    # ------------------------------------------------------------ local

    def recognize_stream(self, rec, stream):
        tot_samples = 0
        result = []
        while True:
            data = stream.read(CHUNK_SIZE)
            if len(data) == 0:
                break
            tot_samples += len(data)
            if rec.AcceptWaveform(data):
                jres = json.loads(rec.Result())
                logging.info(jres)
                result.append(jres)
            else:
                jres = json.loads(rec.PartialResult())
                logging.info(jres)
        jres = json.loads(rec.FinalResult())
        logging.info(jres)
        result.append(jres)
        return result, tot_samples

    # ----------------------------------------------------------- server

    async def recognize_stream_server(self, stream):
        from ..server.wsproto import connect

        async with connect(self.args.server) as ws:
            tot_samples = 0
            result = []
            await ws.send('{ "config" : { "sample_rate" : %f } }' % SAMPLE_RATE)
            while True:
                data = stream.read(CHUNK_SIZE)
                tot_samples += len(data)
                if len(data) == 0:
                    break
                await ws.send(data)
                jres = json.loads(await ws.recv())
                logging.info(jres)
                if "partial" not in jres:
                    result.append(jres)
            await ws.send('{"eof" : 1}')
            jres = json.loads(await ws.recv())
            logging.info(jres)
            result.append(jres)
            return result, tot_samples

    # ----------------------------------------------------------- output

    def format_result(self, result, words_per_line: int = 7) -> str:
        final = ""
        if self.args.output_type in ("srt", "webvtt"):
            subs = []
            for res in result:
                if "result" not in res:
                    continue
                words = res["result"]
                for j in range(0, len(words), words_per_line):
                    line = words[j : j + words_per_line]
                    subs.append(
                        (
                            line[0]["start"],
                            line[-1]["end"],
                            " ".join(w["word"] for w in line),
                        )
                    )
            final = (compose_srt(subs) if self.args.output_type == "srt"
                     else compose_webvtt(subs))
        elif self.args.output_type == "txt":
            final = " ".join(part["text"] for part in result if part.get("text")) + " " \
                if any(p.get("text") for p in result) else ""
            final = final if final else "".join(part["text"] + " " for part in result)
        return final

    # ------------------------------------------------------------ tasks

    def pool_worker(self, inputdata):
        import vosk_tpu

        logging.info("Recognizing %s", inputdata[0])
        start_time = timer()
        try:
            stream = self._audio_stream(inputdata[0])
        except Exception as e:  # noqa: BLE001
            logging.info(e)
            return
        rec = vosk_tpu.KaldiRecognizer(self.model, SAMPLE_RATE)
        rec.SetWords(True)
        result, tot_samples = self.recognize_stream(rec, stream)
        final = self.format_result(result)
        if inputdata[1] != "":
            logging.info("File %s processing complete", inputdata[1])
            Path(inputdata[1]).write_text(final, encoding="utf-8")
        else:
            print(final)
        elapsed = timer() - start_time
        if tot_samples:
            logging.info(
                "Execution time: %.3f sec; xRT %.3f",
                elapsed,
                elapsed * (2 * SAMPLE_RATE) / tot_samples,
            )

    async def server_worker(self):
        import asyncio

        while True:
            try:
                input_file, output_file = self.queue.get_nowait()
            except Exception:  # noqa: BLE001
                break
            logging.info("Recognizing %s", input_file)
            start_time = timer()
            stream = self._audio_stream(input_file)
            result, tot_samples = await self.recognize_stream_server(stream)
            final = self.format_result(result)
            if output_file != "":
                Path(output_file).write_text(final, encoding="utf-8")
            else:
                print(final)
            elapsed = timer() - start_time
            if tot_samples:
                logging.info(
                    "Execution time: %.3f sec; xRT %.3f",
                    elapsed,
                    elapsed * (2 * SAMPLE_RATE) / tot_samples,
                )
            self.queue.task_done()

    async def process_task_list_server(self, task_list):
        import asyncio

        self.queue = Queue()
        for x in task_list:
            self.queue.put(x)
        workers = [
            __import__("asyncio").create_task(self.server_worker())
            for _ in range(self.args.tasks)
        ]
        await asyncio.gather(*workers)

    def process_task_list_pool(self, task_list):
        with Pool() as pool:
            pool.map(self.pool_worker, task_list)

    def process_task_list(self, task_list):
        if getattr(self.args, "server", None) is None:
            self.process_task_list_pool(task_list)
        else:
            import asyncio

            asyncio.run(self.process_task_list_server(task_list))
