"""Long-running enhancement server — the deployment/serving surface.

The reference stops at batch CLIs (clean.py); production serving wants a persistent
process that compiles once and answers many requests. This server loads the generator
exactly like clean.py (train.opts + checkpoint, torch .ckpt auto-detect), warms the
common chunk buckets, then serves:

  GET  /healthz            -> JSON {status, model, slice_size, warm_s, requests}
  POST /enhance            -> body: a WAV file (any int/float subtype, 16 kHz);
                              response: the enhanced WAV.
                              Query params: format=float|pcm16 (default float),
                              seed=<int> for a deterministic per-request z.

Concurrency: requests are served by a thread pool (ThreadingHTTPServer) but device
inference is serialized by a lock — one model instance, deterministic per-request z
stream. Enhancement is chunk-parallel on device (segan.generate batches the whole
chunk grid), so a single request already saturates the chip; RTF ≈ 0.055 (BENCH.md).

Usage:
    python serve.py --g_pretrained_ckpt ckpt/weights_EOE_G-Generator-N.ckpt \
        --cfg_file ckpt/train.opts --port 8080
"""
import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

# ~1 hour of 16 kHz float64 audio as a WAV body — far above any sane request,
# far below anything that could wedge the host allocator
MAX_BODY_BYTES = 512 * 1024 * 1024


def _as_int16(wav):
    """Coerce any scipy-wavfile sample dtype to int16 scale, so the reference's
    int16-domain normalize_wave_minmax applies uniformly (float WAVs come back in
    [-1, 1], int32 at ±2^31, uint8 at 0..255 — feeding those in raw would collapse
    the normalized signal to near-silence)."""
    import numpy as np

    wav = np.asarray(wav)
    if wav.ndim > 1:
        wav = wav[:, 0]  # first channel of multi-channel input
    if wav.dtype == np.int16:
        return wav
    if wav.dtype in (np.float32, np.float64):
        return (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    if wav.dtype == np.int32:
        return (wav >> 16).astype(np.int16)
    if wav.dtype == np.uint8:
        return ((wav.astype(np.int16) - 128) << 8).astype(np.int16)
    raise ValueError(f"unsupported wav dtype {wav.dtype}")


def make_handler(cfg, segan, state):
    import numpy as np

    import jax

    from scipy.io import wavfile as _wavfile

    from segan_pytorch_tpu.ops.signal import normalize_wave_minmax, pre_emphasize_np

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default; --verbose re-enables
            if state["verbose"]:
                BaseHTTPRequestHandler.log_message(self, fmt, *args)

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] != "/healthz":
                return self._json(404, {"error": "unknown path"})
            self._json(200, {
                "status": "ok",
                "model": "WSEGAN" if cfg.wsegan else "SEGAN",
                "slice_size": cfg.slice_size,
                "warm_s": state["warm_s"],
                "requests": state["requests"],
            })

        def do_POST(self):
            # chunked bodies are not supported (we need Content-Length to drain
            # the body safely under keep-alive); say so explicitly instead of
            # reading an empty body and returning a confusing 'bad wav' 400
            if "chunked" in (self.headers.get("Transfer-Encoding") or "").lower():
                self.close_connection = True
                return self._json(501, {"error": "chunked transfer encoding not "
                                                 "supported; send Content-Length"})
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                n = 0
            if n > MAX_BODY_BYTES:
                self.close_connection = True  # don't drain a hostile body
                return self._json(413, {"error": f"body too large ({n} bytes; "
                                                 f"max {MAX_BODY_BYTES})"})
            # drain the body FIRST: under keep-alive (HTTP/1.1) an unread body
            # would be parsed as the next request line on the same connection
            raw = self.rfile.read(n)
            path, _, query = self.path.partition("?")
            if path != "/enhance":
                return self._json(404, {"error": "unknown path"})
            params = {}
            for kv in query.split("&"):
                if "=" in kv:
                    k, _, v = kv.partition("=")
                    params[unquote(k)] = unquote(v)
            # client-input validation -> 400 (before the model's 500 umbrella)
            try:
                overlap = float(params.get("overlap", 0.0))
                seed = int(params["seed"]) if "seed" in params else None
            except ValueError as e:
                return self._json(400, {"error": f"bad query param: {e}"})
            if not (0.0 <= overlap < 0.5):
                return self._json(400, {"error": "overlap must be in [0, 0.5)"})
            try:
                rate, wav = _wavfile.read(io.BytesIO(raw))
            except Exception as e:
                return self._json(400, {"error": f"bad wav: {e}"})
            if rate != 16000:
                return self._json(400, {"error": f"expected 16 kHz, got {rate}"})
            try:
                pwav = pre_emphasize_np(
                    np.asarray(normalize_wave_minmax(_as_int16(wav))), cfg.preemph)
            except ValueError as e:  # unsupported sample dtype etc.
                return self._json(400, {"error": str(e)})
            try:
                with lock:
                    rng = None if seed is None else jax.random.PRNGKey(seed)
                    t0 = time.perf_counter()
                    enh, _ = segan.generate(pwav, rng=rng, overlap=overlap)
                    dt = time.perf_counter() - t0
                    state["requests"] += 1
            except Exception as e:  # surface model errors as 500s, keep serving
                return self._json(500, {"error": str(e)})
            buf = io.BytesIO()
            if params.get("format") == "pcm16":
                pcm = np.clip(enh * 32767.0, -32768, 32767).astype(np.int16)
                _wavfile.write(buf, 16000, pcm)
            else:
                _wavfile.write(buf, 16000, enh.astype(np.float32))
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Enhance-Seconds", f"{dt:.4f}")
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--g_pretrained_ckpt", required=True)
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--warm_seconds", type=float, default=2.0,
                   help="seconds of silence used to pre-compile the common "
                        "chunk-bucket shapes before accepting traffic (0 = off)")
    p.add_argument("--verbose", action="store_true")
    opts = p.parse_args()

    import numpy as np

    from segan_pytorch_tpu.utils.engine import build_enhancement_engine

    cfg, segan = build_enhancement_engine(opts.cfg_file, opts.g_pretrained_ckpt,
                                          opts.seed)
    state = {"warm_s": 0.0, "requests": 0, "verbose": opts.verbose}
    if opts.warm_seconds > 0:
        t0 = time.perf_counter()
        segan.generate(np.zeros(int(16000 * opts.warm_seconds), np.float32))
        state["warm_s"] = round(time.perf_counter() - t0, 3)
        print(f"[serve] warm compile done in {state['warm_s']} s")
    srv = ThreadingHTTPServer((opts.host, opts.port),
                              make_handler(cfg, segan, state))
    print(f"[serve] listening on http://{opts.host}:{opts.port} "
          f"(slice_size {cfg.slice_size})", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
