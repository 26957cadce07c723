"""Streaming enhancement client for serve.py's WebSocket endpoint.

Reads a 16 kHz WAV (or raw PCM16), streams it to ws(s)://host/enhance_stream in
real-time-paced binary frames, collects the enhanced PCM16 as it comes back,
and writes the result WAV. The WebSocket transport (serve.py --ws_port) keeps
the session alive through arbitrarily long input gaps via server pings — this
client demonstrates the intended usage: feed audio as it is captured, receive
enhanced samples with bounded latency (window + hop input samples worst case).

The reference has no serving surface at all (its closest analogue is the batch
clean.py, /root/reference/clean.py:59-82); this completes the deployment story
from the client side.

Usage:
    python tools/ws_client.py --url ws://127.0.0.1:8081/enhance_stream \
        --in noisy.wav --out enhanced.wav --seed 1 [--realtime 1.0]

--realtime R paces the feed at R x real time (0 = blast as fast as possible);
--piece_ms sets the frame granularity. --token adds the bearer header;
--insecure skips TLS verification for wss:// against self-signed certs.
"""
from __future__ import annotations

import argparse
import json
import sys
import threading
import time


def stream_file(url: str, pcm: bytes, piece_bytes: int, realtime: float,
                token: str | None = None, insecure: bool = False,
                query: str = "", on_progress=None):
    """Stream `pcm` (raw 16 kHz PCM16 LE) to the WS endpoint; return
    (enhanced_pcm_bytes, done_info). Receives concurrently with the feed so
    server backpressure never deadlocks the client."""
    from websockets.exceptions import ConnectionClosed
    from websockets.sync.client import connect

    headers = {"Authorization": f"Bearer {token}"} if token else None
    ssl_ctx = None
    if insecure and url.startswith("wss://"):
        import ssl

        ssl_ctx = ssl.create_default_context()
        ssl_ctx.check_hostname = False
        ssl_ctx.verify_mode = ssl.CERT_NONE
    full_url = url + ("?" + query if query else "")
    out = bytearray()
    done: dict = {}

    with connect(full_url, additional_headers=headers, ssl=ssl_ctx,
                 open_timeout=60) as ws:
        def recv_loop():
            try:
                while True:
                    msg = ws.recv(timeout=600)
                    if isinstance(msg, str):
                        done.update(json.loads(msg))
                        return
                    out.extend(msg)
                    if on_progress:
                        on_progress(len(out) // 2)
            except ConnectionClosed:
                return  # server closed without 'done': caller reports it

        rx = threading.Thread(target=recv_loop, daemon=True)
        rx.start()
        # pace the feed: piece_bytes/2 samples = piece_bytes/2/16000 seconds
        piece_seconds = (piece_bytes / 2) / 16000.0
        try:
            for beg in range(0, len(pcm), piece_bytes):
                t0 = time.perf_counter()
                ws.send(pcm[beg: beg + piece_bytes])
                if realtime > 0:
                    budget = piece_seconds / realtime
                    spent = time.perf_counter() - t0
                    if budget > spent:
                        time.sleep(budget - spent)
            ws.send("end")
        except ConnectionClosed:
            # the server may finalize mid-feed (max_stream_seconds, body cap,
            # SIGTERM drain): it sends 'done' + closes while we are still
            # sending. Keep the already-received audio; the recv loop will
            # have captured the done frame (truncated=true) before the close.
            pass
        rx.join(timeout=600)
        if not done:
            raise RuntimeError("stream ended without a 'done' frame")
    return bytes(out), done


def main(argv=None):
    p = argparse.ArgumentParser(
        description="stream a wav through serve.py's WebSocket enhancer")
    p.add_argument("--url", required=True,
                   help="ws(s)://host:port/enhance_stream")
    p.add_argument("--in", dest="inp", required=True,
                   help="input 16 kHz WAV (or raw PCM16 with --raw)")
    p.add_argument("--out", required=True, help="output WAV path")
    p.add_argument("--raw", action="store_true",
                   help="treat --in as headerless 16 kHz PCM16 LE")
    p.add_argument("--seed", type=int, default=None,
                   help="deterministic per-session z")
    p.add_argument("--window", type=int, default=None,
                   help="enhancement window in samples (server default: the "
                        "training slice size; smaller = lower latency)")
    p.add_argument("--overlap", type=float, default=None,
                   help="window cross-fade fraction [0, 0.5)")
    p.add_argument("--piece_ms", type=float, default=100.0,
                   help="feed granularity in milliseconds of audio per frame")
    p.add_argument("--realtime", type=float, default=0.0,
                   help="pace the feed at this multiple of real time "
                        "(1.0 = live microphone rate; 0 = as fast as possible)")
    p.add_argument("--token", default=None, help="bearer token, if required")
    p.add_argument("--insecure", action="store_true",
                   help="skip TLS verification (self-signed wss://)")
    opts = p.parse_args(argv)

    import numpy as np

    if opts.raw:
        pcm = open(opts.inp, "rb").read()
        pcm = pcm[: len(pcm) - (len(pcm) % 2)]
    else:
        from scipy.io import wavfile

        rate, wav = wavfile.read(opts.inp)
        if rate != 16000:
            sys.exit(f"expected 16 kHz input, got {rate}")
        wav = np.asarray(wav)
        if wav.ndim > 1:
            wav = wav[:, 0]
        if wav.dtype != np.int16:
            if wav.dtype in (np.float32, np.float64):
                wav = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
            else:
                sys.exit(f"unsupported wav dtype {wav.dtype}")
        pcm = wav.astype("<i2").tobytes()

    q = []
    if opts.seed is not None:
        q.append(f"seed={opts.seed}")
    if opts.window is not None:
        q.append(f"window={opts.window}")
    if opts.overlap is not None:
        q.append(f"overlap={opts.overlap}")
    piece_bytes = max(2, int(16000 * opts.piece_ms / 1000.0) * 2)

    t0 = time.perf_counter()
    out, done = stream_file(opts.url, pcm, piece_bytes, opts.realtime,
                            token=opts.token, insecure=opts.insecure,
                            query="&".join(q))
    dt = time.perf_counter() - t0
    enh = np.frombuffer(out, dtype="<i2")
    from scipy.io import wavfile as _wf

    _wf.write(opts.out, 16000, enh)
    n_in = len(pcm) // 2
    print(json.dumps({
        "samples_in": n_in, "samples_out": int(enh.size),
        "truncated": bool(done.get("truncated", False)),
        "wall_seconds": round(dt, 3),
        "rtf": round(dt / (n_in / 16000.0), 4) if n_in else None,
        "out": opts.out}))


if __name__ == "__main__":
    main()
