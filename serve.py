"""Long-running enhancement server — the deployment/serving surface.

The reference stops at batch CLIs (clean.py); production serving wants a persistent
process that compiles once and answers many requests. This server loads the generator
exactly like clean.py (train.opts + checkpoint, torch .ckpt auto-detect), warms the
common chunk buckets, then serves:

  GET  /healthz            -> JSON {status, model, slice_size, warm_s, requests,
                              batches} (batches < requests when concurrent
                              requests were coalesced)
  POST /enhance            -> body: a WAV file (any int/float subtype, 16 kHz);
                              response: the enhanced WAV.
                              Query params: format=float|pcm16 (default float),
                              seed=<int> for a deterministic per-request z,
                              overlap=<0..0.5) chunk cross-fade.
  GET  /metrics            -> Prometheus text exposition (requests, device
                              passes, inflight, reloads, enhance seconds);
                              open like /healthz (cluster-internal scrapers)
  POST /admin/reload       -> body: JSON {"g_ckpt": path[, "cfg_file": path]};
                              builds + warms a NEW engine then atomically
                              swaps it in (zero downtime; in-flight requests
                              finish on the old engine; failure leaves the
                              old engine serving). Token-gated like /enhance.
  POST /enhance_stream     -> body: raw 16 kHz PCM16 (little-endian), chunked
                              transfer encoding or Content-Length; response:
                              chunked raw PCM16, enhanced samples emitted with
                              bounded latency as audio arrives (window + hop
                              samples worst case). Query params: seed,
                              overlap (default 0.25), window (samples, must
                              divide by the generator pooling; smaller window
                              = lower latency).
  WS   /enhance_stream     -> (--ws_port) the same streaming contract over a
                              WebSocket: binary frames of raw PCM16 in,
                              binary frames of enhanced PCM16 out, a text
                              frame "end" finalizes the tail and the server
                              answers with a JSON "done" frame. Unlike
                              chunked HTTP, the protocol keeps NATed / LB'd
                              connections alive through arbitrarily long
                              input gaps (server pings every
                              --ws_ping_interval seconds). Same query params
                              and bearer-token gate as the HTTP endpoint.

Concurrency: requests are served by a thread pool (ThreadingHTTPServer); a
MicroBatcher (utils/serving.py) coalesces concurrent /enhance requests into ONE
device pass (their chunk grids concatenate — row-independent math), so N
clients cost ~1 batched forward instead of N serialized ones. Enhancement is
chunk-parallel on device; a single long request already saturates the chip;
RTF ≈ 0.055 (BENCH.md).

Guards: --max_stream_seconds caps a streaming session's wall clock (the stream
is finalized from the audio fed so far and the connection closed);
--target_batch_seconds adapts the MicroBatcher's chunk budget to measured
warm-batch device latency so one coalesced pass stays under the target.

Deployment: --auth_token (or $SEGAN_SERVE_TOKEN) gates the enhancement
endpoints behind 'Authorization: Bearer <token>' (/healthz stays open for
load-balancer probes); --tls_cert/--tls_key serve HTTPS with the handshake
deferred to handler threads; --tls_client_ca additionally demands a
client certificate signed by that CA (mutual TLS, enforced at the handshake
on both listeners); SIGTERM/SIGINT triggers a graceful drain (stop
accepting, finish in-flight requests up to --drain_seconds, exit 0 — composes
with the trainer's preemption-safe SIGTERM checkpointing for full-stack
preemption hygiene).

Usage:
    python serve.py --g_pretrained_ckpt ckpt/weights_EOE_G-Generator-N.ckpt \
        --cfg_file ckpt/train.opts --port 8080
"""
import argparse
import hmac
import io
import json
import signal
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

# ~1 hour of 16 kHz float64 audio as a WAV body — far above any sane request,
# far below anything that could wedge the host allocator
MAX_BODY_BYTES = 512 * 1024 * 1024


class InflightCounter:
    """Counts requests currently being handled, so a SIGTERM drain can wait
    for work in flight instead of cutting device passes mid-response."""

    def __init__(self):
        self._n = 0
        self._lock = threading.Lock()

    def __enter__(self):
        with self._lock:
            self._n += 1
        return self

    def __exit__(self, *exc):
        with self._lock:
            self._n -= 1
        return False

    def count(self):
        with self._lock:
            return self._n


def _parse_params(query: str) -> dict:
    """Query-string params as a dict (URL-decoded). One parser shared by the
    HTTP and WS handlers so the two endpoints can never diverge."""
    params = {}
    for kv in query.split("&"):
        if "=" in kv:
            k, _, v = kv.partition("=")
            params[unquote(k)] = unquote(v)
    return params


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
    from segan_pytorch_tpu.utils.engine import build_enhancement_engine
    from segan_pytorch_tpu.utils.serving import (MicroBatcher,
                                                 StreamingEnhancer,
                                                 WindowBatcher)

    # (cfg, engine, batcher, win_batcher) publish as ONE tuple so
    # /admin/reload swaps are tear-free: a request snapshots state["gen"] once
    # and uses a consistent generation end-to-end (pre-emphasis coefficient,
    # engine, batchers must never mix across a reload). win_batcher coalesces
    # concurrent STREAMING sessions' window forwards into shared device passes
    # (None with --no_stream_coalesce: per-session forwards, bit-deterministic
    # regardless of concurrent load).
    wb0 = WindowBatcher(segan) if state.get("stream_coalesce", True) else None
    if wb0 is not None and float(state.get("warm_seconds", 0)) > 0:
        # pre-compile the streaming row buckets for the default window so the
        # first concurrent streams never pay an XLA compile mid-hop
        t0 = time.perf_counter()
        wb0.warm(cfg.slice_size, max_rows=8)  # 4 shapes; 16+ rows compile lazily
        if state["verbose"]:
            print(f"[serve] stream-batch warm compile: "
                  f"{time.perf_counter() - t0:.1f} s", flush=True)
    state["gen"] = (cfg, segan, MicroBatcher(
        segan,
        target_batch_seconds=state.get("target_batch_seconds", 0.0)), wb0)
    state.setdefault("batches_prev", 0)  # passes from engines retired by reload
    state.setdefault("win_batches_prev", 0)
    state.setdefault("win_windows_prev", 0)
    state.setdefault("reloads", 0)
    state.setdefault("enh_seconds_sum", 0.0)
    state["mlock"] = threading.Lock()       # counters (requests/sums/passes)
    state["reload_lock"] = threading.Lock()  # one reload at a time
    max_stream_s = float(state.get("max_stream_seconds", 0.0))
    auth_token = state.get("auth_token") or ""
    inflight = state["inflight"]

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default; --verbose re-enables
            if state["verbose"]:
                BaseHTTPRequestHandler.log_message(self, fmt, *args)

        def _json(self, code, obj, extra_headers=()):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in extra_headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _authorized(self):
            """Bearer-token gate for the enhancement endpoints. /healthz stays
            open (load balancers probe it unauthenticated). Constant-time
            compare; an unauthorized request's body is never read (hostile
            clients don't get to stream 512 MB before the 401), so the
            connection must close."""
            if not auth_token:
                return True
            header = self.headers.get("Authorization", "")
            # compare as bytes: compare_digest(str, str) raises TypeError on
            # non-ASCII, which an unauthenticated client could trigger at will
            return (header.startswith("Bearer ")
                    and hmac.compare_digest(header[7:].encode("utf-8"),
                                            auth_token.encode("utf-8")))

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/metrics":
                return self._metrics()
            if path != "/healthz":
                return self._json(404, {"error": "unknown path"})
            c, eng, bt, wb = state["gen"]
            with state["mlock"]:
                requests, bp = state["requests"], state["batches_prev"]
                wbp, wwp = state["win_batches_prev"], state["win_windows_prev"]
            self._json(200, {
                "status": "draining" if state.get("draining") else "ok",
                "model": type(eng).__name__,  # actual engine class, not flags
                "slice_size": c.slice_size,
                "warm_s": state["warm_s"],
                "requests": requests,
                "batches": bp + bt.batches,
                "batch_chunk_budget": bt.effective_max_chunks,
                "stream_coalesce": wb is not None,
                "win_batches": wbp + (wb.batches if wb else 0),
                "win_windows": wwp + (wb.windows if wb else 0),
                "inflight": inflight.count(),
                "auth": bool(auth_token),
                "reloads": state["reloads"],
                "ws_port": state.get("ws_port", 0),
            })

        def _metrics(self):
            """Prometheus text exposition (open like /healthz: scrapers are
            cluster-internal; the enhancement endpoints stay token-gated)."""
            bt, wb = state["gen"][2], state["gen"][3]
            with state["mlock"]:
                enh_sum = state["enh_seconds_sum"]
                requests, bp = state["requests"], state["batches_prev"]
                wbp, wwp = state["win_batches_prev"], state["win_windows_prev"]
            lines = [
                "# TYPE segan_requests_total counter",
                f"segan_requests_total {requests}",
                "# TYPE segan_device_passes_total counter",
                f"segan_device_passes_total {bp + bt.batches}",
                "# TYPE segan_stream_window_passes_total counter",
                f"segan_stream_window_passes_total "
                f"{wbp + (wb.batches if wb else 0)}",
                "# TYPE segan_stream_windows_total counter",
                f"segan_stream_windows_total "
                f"{wwp + (wb.windows if wb else 0)}",
                "# TYPE segan_inflight_requests gauge",
                f"segan_inflight_requests {inflight.count()}",
                "# TYPE segan_reloads_total counter",
                f"segan_reloads_total {state['reloads']}",
                "# TYPE segan_enhance_seconds_sum counter",
                f"segan_enhance_seconds_sum {enh_sum:.6f}",
                "# TYPE segan_draining gauge",
                f"segan_draining {int(bool(state.get('draining')))}",
            ]
            body = ("\n".join(lines) + "\n").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _params(self):
            _, _, query = self.path.partition("?")
            return _parse_params(query)

        def do_POST(self):
            if not self._authorized():
                self.close_connection = True  # body unread; can't keep-alive
                return self._json(
                    401, {"error": "unauthorized"},
                    extra_headers=[("WWW-Authenticate", "Bearer"),
                                   ("Connection", "close")])
            with inflight:
                try:
                    return self._do_post()
                finally:
                    if state.get("draining"):
                        # keep-alive connections must not outlive the drain
                        self.close_connection = True

        def _do_post(self):
            path, _, _ = self.path.partition("?")
            chunked = "chunked" in (self.headers.get("Transfer-Encoding")
                                    or "").lower()
            if path == "/enhance_stream":
                return self._enhance_stream(self._params(), chunked)
            # /enhance: chunked bodies are not supported (we need
            # Content-Length to drain the body safely under keep-alive); say so
            # instead of reading an empty body and returning a confusing 400
            if chunked:
                self.close_connection = True
                return self._json(501, {"error": "chunked transfer encoding "
                                                 "only supported on "
                                                 "/enhance_stream"})
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
            if path == "/admin/reload":
                return self._admin_reload(raw)
            if path != "/enhance":
                return self._json(404, {"error": "unknown path"})
            params = self._params()
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
            gen_cfg, _, gen_batcher, _ = state["gen"]  # consistent generation
            try:
                pwav = pre_emphasize_np(
                    np.asarray(normalize_wave_minmax(_as_int16(wav))),
                    gen_cfg.preemph)
            except ValueError as e:  # unsupported sample dtype etc.
                return self._json(400, {"error": str(e)})
            try:
                rng = None if seed is None else jax.random.PRNGKey(seed)
                t0 = time.perf_counter()
                # concurrent requests coalesce into one device pass
                enh = gen_batcher.enhance(pwav, rng=rng, overlap=overlap)
                dt = time.perf_counter() - t0
                with state["mlock"]:
                    state["requests"] += 1
                    state["enh_seconds_sum"] += dt
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

        def _admin_reload(self, raw: bytes):
            """Zero-downtime checkpoint swap: build + warm a NEW engine, then
            atomically publish it (in-flight requests finish on the old one).
            Token-gated with the other POST endpoints; a failed build leaves
            the serving engine untouched (500, keep serving)."""
            try:
                req = json.loads(raw or b"{}")
            except ValueError as e:
                return self._json(400, {"error": f"bad json: {e}"})
            g_ckpt = req.get("g_ckpt")
            if not g_ckpt:
                return self._json(400, {"error": "missing 'g_ckpt'"})
            cfg_file = req.get("cfg_file") or state["cfg_file"]
            with state["reload_lock"]:  # one reload at a time
                try:
                    ncfg, nengine = build_enhancement_engine(
                        cfg_file, g_ckpt, state["seed"])
                    warm_s = float(state.get("warm_seconds", 0.2))
                    if warm_s > 0:
                        nengine.generate(
                            np.zeros(int(16000 * warm_s), np.float32))
                    nbatcher = MicroBatcher(
                        nengine,
                        target_batch_seconds=state.get(
                            "target_batch_seconds", 0.0))
                    nwb = (WindowBatcher(nengine)
                           if state.get("stream_coalesce", True) else None)
                    if nwb is not None and warm_s > 0:
                        nwb.warm(ncfg.slice_size, max_rows=8)
                except Exception as e:
                    return self._json(500, {"error": f"reload failed: {e}"})
                old_batcher, old_wb = state["gen"][2], state["gen"][3]
                state["gen"] = (ncfg, nengine, nbatcher, nwb)  # tear-free
                state["cfg_file"] = cfg_file
                state["reloads"] += 1
                # fold the retiring generation's pass counts into the *_prev
                # accumulators AT SWAP TIME — /metrics reads prev + CURRENT
                # batcher, so deferring this to retirement (150 s later) made
                # every Prometheus counter REGRESS for that window after a
                # reload (caught by tools/serving_soak.py monotonicity check)
                with state["mlock"]:
                    swap_b = old_batcher.batches
                    swap_wb = old_wb.batches if old_wb is not None else 0
                    swap_ww = old_wb.windows if old_wb is not None else 0
                    state["batches_prev"] += swap_b
                    state["win_batches_prev"] += swap_wb
                    state["win_windows_prev"] += swap_ww

            def _retire(b=old_batcher, w=old_wb,
                        b0=swap_b, wb0=swap_wb, ww0=swap_ww):
                # requests that snapshotted the old generation before the swap
                # may still be enhancing on it (enhance timeout 120 s); close
                # afterwards so its worker thread, jit caches, and device
                # buffers are actually released instead of leaking per reload.
                # Only the passes accrued AFTER the swap fold in here (the
                # pre-swap counts were folded at swap time above).
                time.sleep(150)
                try:
                    b.close()
                    if w is not None:
                        w.close()
                finally:
                    with state["mlock"]:
                        state["batches_prev"] += b.batches - b0
                        if w is not None:
                            state["win_batches_prev"] += w.batches - wb0
                            state["win_windows_prev"] += w.windows - ww0

            threading.Thread(target=_retire, daemon=True,
                             name="batcher-retire").start()
            if state["verbose"]:
                print(f"[serve] reloaded engine from {g_ckpt}", flush=True)
            return self._json(200, {"status": "reloaded", "g_ckpt": g_ckpt,
                                    "reloads": state["reloads"]})

        def _drain_input_bounded(self, max_bytes=8 * 1024 * 1024,
                                 timeout_s=2.0):
            """Discard up to max_bytes of pending request body (short socket
            timeout). Closing with unread data in the kernel buffer makes Linux
            send RST, which can drop the already-written response; a bounded
            drain avoids that for reasonably-sized tails without letting a
            hostile client stream forever."""
            try:
                self.connection.settimeout(timeout_s)
                left = max_bytes
                while left > 0:
                    got = self.rfile.read(min(left, 65536))
                    if not got:
                        break
                    left -= len(got)
            except (OSError, ValueError):
                pass

        # ---- streaming: raw PCM16 in (chunked or sized), chunked PCM16 out ----
        def _incoming_pieces(self, chunked):
            if chunked:
                total = 0
                while True:
                    line = self.rfile.readline(1026)
                    try:
                        size = int(line.split(b";")[0].strip() or b"0", 16)
                    except ValueError:
                        raise ValueError("bad chunk framing")
                    if size == 0:
                        self.rfile.readline()  # trailing CRLF after last chunk
                        return
                    total += size
                    if total > MAX_BODY_BYTES:
                        raise ValueError("stream too large")
                    data = self.rfile.read(size)
                    self.rfile.read(2)  # CRLF
                    yield data
            else:
                n = int(self.headers.get("Content-Length", 0))
                if n > MAX_BODY_BYTES:
                    raise ValueError("stream too large")
                # read in window-sized pieces so enhancement genuinely overlaps
                # the arrival of later audio
                left = n
                while left > 0:
                    piece = self.rfile.read(min(left, 65536))
                    if not piece:
                        return
                    left -= len(piece)
                    yield piece

        def _write_chunk(self, data: bytes):
            # one socket write per HTTP chunk (framing + payload + CRLF): a
            # slow client applies backpressure in a single blocking write
            # instead of three, and small chunks don't interleave with Nagle
            if data:
                self.wfile.write(b"%x\r\n%s\r\n" % (len(data), data))

        def _enhance_stream(self, params, chunked):
            gen_cfg, gen_engine, _, gen_wb = state["gen"]  # one generation
            try:
                overlap = float(params.get("overlap", 0.25))
                window = int(params.get("window", gen_cfg.slice_size))
                seed = int(params["seed"]) if "seed" in params else None
            except ValueError as e:
                self.close_connection = True
                return self._json(400, {"error": f"bad query param: {e}"})
            try:
                rng = None if seed is None else jax.random.PRNGKey(seed)
                streamer = StreamingEnhancer(gen_engine, window=window,
                                             overlap=overlap, rng=rng,
                                             batcher=gen_wb)
            except ValueError as e:  # bad window/overlap
                self.close_connection = True
                return self._json(400, {"error": str(e)})
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.send_header("X-Stream-Latency-Samples",
                             str(streamer.latency_samples))
            self.end_headers()
            # a silent client must not pin this handler thread forever: the
            # session guard below only runs when a piece ARRIVES, so bound the
            # blocking reads themselves with a socket timeout
            if max_stream_s > 0:
                self.connection.settimeout(min(60.0, max_stream_s))
            carry = b""
            t0 = time.perf_counter()
            n_out = 0
            truncated = False
            try:
                try:
                    for piece in self._incoming_pieces(chunked):
                        if max_stream_s > 0 and \
                                time.perf_counter() - t0 > max_stream_s:
                            # session guard: stop consuming input, finalize what
                            # was fed, and drop the connection (unread body
                            # remains, so keep-alive reuse would misparse it)
                            truncated = True
                            break
                        carry += piece
                        usable = len(carry) - (len(carry) % 2)
                        if not usable:
                            continue
                        pcm = np.frombuffer(carry[:usable], dtype="<i2")
                        carry = carry[usable:]
                        out = streamer.feed(
                            np.asarray(normalize_wave_minmax(pcm), np.float32))
                        pcm_out = np.clip(out * 32767.0, -32768,
                                          32767).astype("<i2")
                        n_out += pcm_out.size
                        self._write_chunk(pcm_out.tobytes())
                except TimeoutError:
                    # silent client: no data within the socket timeout —
                    # finalize what was fed, like a session-cap truncation
                    truncated = True
                out = streamer.flush()
                pcm_out = np.clip(out * 32767.0, -32768, 32767).astype("<i2")
                n_out += pcm_out.size
                self._write_chunk(pcm_out.tobytes())
                self.wfile.write(b"0\r\n\r\n")
                if truncated:
                    # best effort against a TCP RST racing the final chunks:
                    # briefly drain what the client already sent so the close
                    # doesn't discard our written-but-unread response
                    self._drain_input_bounded()
                    self.close_connection = True
                with state["mlock"]:
                    state["requests"] += 1
                if state["verbose"]:
                    dt = time.perf_counter() - t0
                    print(f"[serve] stream: {n_out} samples in {dt:.3f}s "
                          f"(window {window}, overlap {overlap}"
                          f"{', TRUNCATED at session limit' if truncated else ''})",
                          flush=True)
            except (ValueError, ConnectionError, BrokenPipeError,
                    TimeoutError) as e:
                # mid-stream failure (bad framing, client gone, or a write
                # stalled past the socket timeout): the only safe recovery is
                # dropping the connection (headers are already out)
                if state["verbose"]:
                    print(f"[serve] stream aborted: {e}", flush=True)
                self.close_connection = True

    return Handler


def make_ws_handler(state):
    """WebSocket flavor of /enhance_stream (served on --ws_port).

    Completes the streaming surface for long-lived sessions: chunked HTTP
    cannot ping during input gaps, so idle streams die at NAT/LB timeouts;
    WebSocket keepalive (server→client pings, handled by the `websockets`
    connection thread) holds the session open however long the client stays
    silent. Protocol:

      client → server  binary frame: raw 16 kHz PCM16 LE audio, any size
                       text frame "end" (or "flush"): finalize the stream
      server → client  binary frame: enhanced PCM16 as samples finalize
                       text frame (after "end"): JSON {"event": "done",
                       "samples_out": N, "truncated": bool}, then a clean
                       close

    Auth, query params (seed/overlap/window), the per-session z, the
    bounded-latency emission rule, and the max_stream_seconds cap all match
    the HTTP endpoint — same StreamingEnhancer underneath, so for the same
    seed the two endpoints produce byte-identical PCM.
    """
    import numpy as np

    import jax

    from websockets.exceptions import ConnectionClosed

    from segan_pytorch_tpu.ops.signal import normalize_wave_minmax
    from segan_pytorch_tpu.utils.serving import StreamingEnhancer

    auth_token = state.get("auth_token") or ""
    max_stream_s = float(state.get("max_stream_seconds", 0.0))
    inflight = state["inflight"]

    def handler(ws):
        if auth_token:  # same bearer gate as the HTTP POST endpoints
            header = ws.request.headers.get("Authorization", "")
            if not (header.startswith("Bearer ")
                    and hmac.compare_digest(header[7:].encode("utf-8"),
                                            auth_token.encode("utf-8"))):
                ws.close(code=1008, reason="unauthorized")
                return
        path, _, query = ws.request.path.partition("?")
        if path != "/enhance_stream":
            ws.close(code=1008, reason="unknown path")
            return
        gen_cfg, gen_engine, _, gen_wb = state["gen"]  # consistent generation
        # Bound WRITES: ws.send ultimately blocks in sendall, and a client
        # that stops reading would otherwise hold the (non-daemon) connection
        # thread forever — past SIGTERM drain. SO_SNDTIMEO times out sends
        # only (a plain settimeout would also kill the background reader
        # during idle input gaps, which keepalive pings deliberately allow).
        # On timeout sendall raises OSError -> the session aborts below.
        try:
            import socket as _socket
            import struct as _struct
            send_timeout = min(60.0, max_stream_s) if max_stream_s > 0 else 60.0
            ws.socket.setsockopt(
                _socket.SOL_SOCKET, _socket.SO_SNDTIMEO,
                _struct.pack("ll", int(send_timeout), 0))
        except (OSError, AttributeError):  # pragma: no cover - defensive
            pass
        try:
            params = _parse_params(query)
            overlap = float(params.get("overlap", 0.25))
            window = int(params.get("window", gen_cfg.slice_size))
            seed = int(params["seed"]) if "seed" in params else None
            rng = None if seed is None else jax.random.PRNGKey(seed)
            streamer = StreamingEnhancer(gen_engine, window=window,
                                         overlap=overlap, rng=rng,
                                         batcher=gen_wb)
        except ValueError as e:  # bad query param / window / overlap
            ws.close(code=1008, reason=str(e)[:120])
            return
        with inflight:
            carry = b""
            t0 = time.perf_counter()
            n_in_bytes = 0
            n_out = 0
            truncated = False
            while True:
                # bounded recv: enforces the session wall-clock cap and lets a
                # SIGTERM drain finalize sessions promptly (connection threads
                # are non-daemon — they must not outlive the drain; checked
                # here too, not only on timeout, so a continuously-sending
                # client can't hold the process past --drain_seconds)
                if state.get("draining"):
                    truncated = True
                    break
                remaining = (max_stream_s - (time.perf_counter() - t0)
                             if max_stream_s > 0 else 1e9)
                if remaining <= 0:
                    truncated = True
                    break
                try:
                    msg = ws.recv(timeout=min(remaining, 1.0))
                except TimeoutError:
                    continue  # idle gap: keepalive pings hold the connection
                except ConnectionClosed:
                    return  # client gone without "end": no one to finalize to
                if isinstance(msg, str):
                    if msg.strip().lower() in ("end", "flush"):
                        break
                    continue  # unknown text frames ignored (forward compat)
                n_in_bytes += len(msg)
                if n_in_bytes > MAX_BODY_BYTES:
                    # same cumulative cap as the HTTP endpoint ('stream too
                    # large'): finalize what was fed and close
                    truncated = True
                    break
                carry += msg
                usable = len(carry) - (len(carry) % 2)
                if not usable:
                    continue
                pcm = np.frombuffer(carry[:usable], dtype="<i2")
                carry = carry[usable:]
                out = streamer.feed(
                    np.asarray(normalize_wave_minmax(pcm), np.float32))
                if out.size:
                    pcm_out = np.clip(out * 32767.0, -32768,
                                      32767).astype("<i2")
                    n_out += pcm_out.size
                    try:
                        ws.send(pcm_out.tobytes())
                    except (ConnectionClosed, OSError):
                        return  # OSError: SO_SNDTIMEO fired (stalled reader)
            out = streamer.flush()
            pcm_out = np.clip(out * 32767.0, -32768, 32767).astype("<i2")
            n_out += pcm_out.size
            try:
                if pcm_out.size:
                    ws.send(pcm_out.tobytes())
                ws.send(json.dumps({"event": "done", "samples_out": n_out,
                                    "truncated": truncated}))
                ws.close()
            except (ConnectionClosed, OSError):
                pass  # OSError: SO_SNDTIMEO fired (stalled reader)
            with state["mlock"]:
                state["requests"] += 1
            if state["verbose"]:
                dt = time.perf_counter() - t0
                print(f"[serve] ws stream: {n_out} samples in {dt:.3f}s "
                      f"(window {window}, overlap {overlap}"
                      f"{', TRUNCATED at session limit' if truncated else ''})",
                      flush=True)

    return handler


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
    p.add_argument("--max_stream_seconds", type=float, default=3600.0,
                   help="wall-clock cap per /enhance_stream session; past it the "
                        "stream is finalized and the connection closed (0 = "
                        "unlimited)")
    p.add_argument("--target_batch_seconds", type=float, default=0.0,
                   help=">0: adapt the MicroBatcher chunk budget so one "
                        "coalesced device pass stays under this latency "
                        "(measured from warm batches; 0 = fixed budget)")
    p.add_argument("--no_stream_coalesce", action="store_true",
                   help="disable coalescing concurrent streaming sessions' "
                        "window forwards into shared device passes. Coalesced "
                        "output equals the per-session path to float "
                        "tolerance (~1 ulp: XLA retiles convs per batch "
                        "shape); disable for bit-determinism independent of "
                        "concurrent load")
    p.add_argument("--ws_port", type=int, default=0,
                   help="also serve /enhance_stream over WebSocket on this "
                        "port (0 = off): binary PCM16 frames in/out, text "
                        "'end' finalizes; server pings keep idle sessions "
                        "alive through NAT/LB timeouts (same auth/TLS)")
    p.add_argument("--ws_ping_interval", type=float, default=20.0,
                   help="seconds between WebSocket keepalive pings during "
                        "input gaps (0 = disable pings)")
    p.add_argument("--auth_token", default=None,
                   help="require 'Authorization: Bearer <token>' on /enhance "
                        "and /enhance_stream (/healthz stays open); defaults "
                        "to $SEGAN_SERVE_TOKEN when set")
    p.add_argument("--tls_cert", default=None,
                   help="path to a PEM certificate chain; with --tls_key, "
                        "serve HTTPS instead of HTTP")
    p.add_argument("--tls_key", default=None,
                   help="path to the PEM private key for --tls_cert")
    p.add_argument("--tls_client_ca", default=None,
                   help="PEM CA bundle for MUTUAL TLS: with --tls_cert, "
                        "require clients to present a certificate signed by "
                        "this CA (connections without one fail the "
                        "handshake); applies to the HTTP and WebSocket "
                        "listeners alike")
    p.add_argument("--drain_seconds", type=float, default=30.0,
                   help="on SIGTERM/SIGINT: stop accepting connections, wait "
                        "up to this long for in-flight requests, then exit 0")
    p.add_argument("--verbose", action="store_true")
    opts = p.parse_args()
    if bool(opts.tls_cert) != bool(opts.tls_key):
        p.error("--tls_cert and --tls_key must be given together")
    if opts.tls_client_ca and not opts.tls_cert:
        p.error("--tls_client_ca requires --tls_cert/--tls_key")

    import numpy as np

    from segan_pytorch_tpu.utils.engine import build_enhancement_engine

    import os

    cfg, segan = build_enhancement_engine(opts.cfg_file, opts.g_pretrained_ckpt,
                                          opts.seed)
    inflight = InflightCounter()
    state = {"warm_s": 0.0, "requests": 0, "verbose": opts.verbose,
             "max_stream_seconds": opts.max_stream_seconds,
             "target_batch_seconds": opts.target_batch_seconds,
             "stream_coalesce": not opts.no_stream_coalesce,
             "auth_token": opts.auth_token or os.environ.get(
                 "SEGAN_SERVE_TOKEN", ""),
             "inflight": inflight, "draining": False,
             "cfg_file": opts.cfg_file, "seed": opts.seed,
             "warm_seconds": opts.warm_seconds}
    if opts.warm_seconds > 0:
        t0 = time.perf_counter()
        segan.generate(np.zeros(int(16000 * opts.warm_seconds), np.float32))
        state["warm_s"] = round(time.perf_counter() - t0, 3)
        print(f"[serve] warm compile done in {state['warm_s']} s")
    state["ws_port"] = opts.ws_port
    srv = ThreadingHTTPServer((opts.host, opts.port),
                              make_handler(cfg, segan, state))
    scheme = "http"
    ctx = None
    if opts.tls_cert:
        import ssl

        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(opts.tls_cert, opts.tls_key)
        if opts.tls_client_ca:
            # mutual TLS: a client without a CA-signed certificate fails the
            # handshake in its handler thread before any route is reached
            ctx.verify_mode = ssl.CERT_REQUIRED
            ctx.load_verify_locations(cafile=opts.tls_client_ca)
        # handshake on first read in the HANDLER thread, not in accept():
        # a client that stalls mid-handshake must not block the accept loop
        srv.socket = ctx.wrap_socket(srv.socket, server_side=True,
                                     do_handshake_on_connect=False)
        scheme = "https"
    ws_srv = None
    if opts.ws_port:
        from websockets.sync.server import serve as ws_serve

        ws_srv = ws_serve(make_ws_handler(state), opts.host, opts.ws_port,
                          ssl=ctx,
                          ping_interval=opts.ws_ping_interval or None,
                          max_size=16 * 1024 * 1024)
        threading.Thread(target=ws_srv.serve_forever, daemon=True,
                         name="ws-server").start()
        print(f"[serve] websocket streaming on "
              f"{'wss' if ctx else 'ws'}://{opts.host}:{opts.ws_port}"
              f"/enhance_stream (ping every {opts.ws_ping_interval:g}s)",
              flush=True)

    def _graceful_stop(signum, _frame):
        state["draining"] = True
        print(f"[serve] signal {signum}: draining "
              f"(up to {opts.drain_seconds:.0f}s for in-flight requests)",
              flush=True)
        # shutdown() blocks until serve_forever exits — must not run in the
        # signal handler's (main) thread, which IS inside serve_forever
        threading.Thread(target=srv.shutdown, daemon=True).start()
        if ws_srv is not None:  # stop accepting ws sessions too; in-flight
            threading.Thread(target=ws_srv.shutdown,  # ones see 'draining'
                             daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful_stop)
    signal.signal(signal.SIGINT, _graceful_stop)
    print(f"[serve] listening on {scheme}://{opts.host}:{opts.port} "
          f"(slice_size {cfg.slice_size}"
          f"{', auth required' if state['auth_token'] else ''})", flush=True)
    srv.serve_forever()
    # close the LISTENING socket immediately so new clients get
    # connection-refused (fast LB failover) instead of hanging in the backlog
    # for the whole drain window; established connections are unaffected
    srv.server_close()
    # grace for requests accepted before the signal but not yet counted
    # (thread spawn + deferred TLS handshake + header parse precede do_POST's
    # inflight increment), then wait out genuinely in-flight work — handler
    # threads are daemons, so process exit reaps whatever misses the deadline
    deadline = time.time() + max(0.0, opts.drain_seconds)
    grace = min(1.0, max(0.0, opts.drain_seconds))
    t_grace = time.time() + grace
    while time.time() < t_grace:
        time.sleep(0.05)
    while inflight.count() > 0 and time.time() < deadline:
        time.sleep(0.05)
    n = inflight.count()
    print(f"[serve] shutdown complete"
          f"{f' ({n} request(s) abandoned at drain deadline)' if n else ''}",
          flush=True)


if __name__ == "__main__":
    main()
