"""End-to-end test of the serving surface (serve.py): spawn the server on a tiny
model checkpoint, drive it over HTTP (healthz, enhance, determinism, error paths)."""
import io
import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Tiny SEGAN checkpoint + train.opts shared by the server fixtures."""
    from segan_pytorch_tpu.utils.config import SEGANConfig
    from segan_pytorch_tpu.models import SEGAN
    from segan_pytorch_tpu.utils.checkpoint import Saver

    root = tmp_path_factory.mktemp("serve")
    cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                      genc_poolings=[4, 4, 4], z_dim=32,
                      denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                      dpool_slen=16, batch_size=1, save_path=str(root))
    segan = SEGAN(cfg)
    segan.init_state(batch_size=1)
    gs = Saver(str(root), prefix="EOE_G-")
    ds = Saver(str(root), prefix="EOE_D-")
    segan.save(gs, ds, 1)
    with open(root / "train.opts", "w") as f:
        f.write(cfg.to_json())
    return root


def _unverified_ctx():
    import ssl

    ctx = ssl.create_default_context()
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    return ctx


def _launch_server(root, port, extra_args=(), scheme="http", client_ctx=None):
    env = dict(os.environ, SEGAN_TPU_PLATFORM="cpu", PYTHONPATH=REPO)
    # server output goes to a FILE, not a PIPE: an undrained PIPE fills after
    # ~64K of logs and then BLOCKS the server mid-request (observed as an
    # order-dependent hang of whichever test ran after enough output)
    log_path = root / f"server_{port}.log"
    log_f = open(log_path, "w")
    proc = subprocess.Popen(
        [sys.executable, "serve.py",
         "--g_pretrained_ckpt", str(root / "weights_EOE_G-Generator-1.ckpt"),
         "--cfg_file", str(root / "train.opts"),
         "--port", str(port), "--warm_seconds", "0.2", *extra_args],
        cwd=REPO, env=env, stdout=log_f, stderr=subprocess.STDOUT,
        text=True)
    base = f"{scheme}://127.0.0.1:{port}"
    ctx = client_ctx or (_unverified_ctx() if scheme == "https" else None)
    deadline = time.time() + 180
    last_err = None
    while time.time() < deadline:
        if proc.poll() is not None:
            log_f.flush()
            raise RuntimeError(
                f"server died:\n{log_path.read_text()[-3000:]}")
        try:
            with urllib.request.urlopen(base + "/healthz", timeout=2,
                                        context=ctx) as r:
                if r.status == 200:
                    break
        except Exception as e:
            last_err = e
            time.sleep(1.0)
    else:
        proc.kill()
        raise RuntimeError(f"server never became healthy: {last_err}")
    return base, proc, log_f


@pytest.fixture(scope="module")
def server(tiny_ckpt):
    base, proc, log_f = _launch_server(tiny_ckpt, 29777)
    yield base
    proc.kill()
    proc.wait(timeout=10)
    log_f.close()


def _wav_bytes(n=3000, seed=0, dtype=np.int16):
    from scipy.io import wavfile

    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.randn(n)
    if dtype == np.int16:
        data = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    else:
        data = x.astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, 16000, data)
    return buf.getvalue()


class TestServe:
    def test_healthz(self, server):
        with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
            info = json.loads(r.read())
        assert info["status"] == "ok"
        assert info["model"] == "SEGAN"
        assert info["slice_size"] == 1024

    def test_enhance_roundtrip_and_determinism(self, server):
        from scipy.io import wavfile

        body = _wav_bytes()
        outs = []
        for _ in range(2):
            req = urllib.request.Request(server + "/enhance?seed=5", data=body,
                                         headers={"Content-Type": "audio/wav"})
            with urllib.request.urlopen(req, timeout=120) as r:
                assert r.status == 200
                assert float(r.headers["X-Enhance-Seconds"]) > 0
                rate, enh = wavfile.read(io.BytesIO(r.read()))
            assert rate == 16000
            assert enh.shape == (3000,)
            assert enh.dtype == np.float32
            assert np.all(np.isfinite(enh))
            outs.append(enh)
        np.testing.assert_array_equal(outs[0], outs[1])  # same seed -> same z

    def test_enhance_pcm16_format(self, server):
        from scipy.io import wavfile

        req = urllib.request.Request(server + "/enhance?format=pcm16",
                                     data=_wav_bytes(n=2048))
        with urllib.request.urlopen(req, timeout=120) as r:
            rate, enh = wavfile.read(io.BytesIO(r.read()))
        assert enh.dtype == np.int16 and enh.shape == (2048,)

    def test_bad_input_is_400_and_server_survives(self, server):
        req = urllib.request.Request(server + "/enhance", data=b"not a wav")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        # still healthy afterwards
        with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
            assert r.status == 200


class TestServeStreaming:
    def _stream(self, server, pcm_bytes, query, chunk_sizes):
        """Chunked-transfer POST of raw PCM16; returns the streamed PCM16."""
        import http.client

        host = server.split("//")[1]
        conn = http.client.HTTPConnection(host, timeout=120)
        try:
            conn.putrequest("POST", "/enhance_stream?" + query)
            conn.putheader("Transfer-Encoding", "chunked")
            conn.endheaders()
            pos = 0
            for sz in chunk_sizes:
                piece = pcm_bytes[pos: pos + sz]
                pos += len(piece)
                if piece:
                    conn.send(f"{len(piece):x}\r\n".encode() + piece + b"\r\n")
            if pos < len(pcm_bytes):
                rest = pcm_bytes[pos:]
                conn.send(f"{len(rest):x}\r\n".encode() + rest + b"\r\n")
            conn.send(b"0\r\n\r\n")
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()[:500]
            assert int(resp.headers["X-Stream-Latency-Samples"]) > 0
            data = resp.read()  # http.client decodes the chunked framing
            return np.frombuffer(data, dtype="<i2")
        finally:
            conn.close()

    def test_stream_roundtrip_matches_length(self, server):
        n = 2500
        rng = np.random.RandomState(5)
        t = np.arange(n) / 16000.0
        x = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.randn(n)
        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        out = self._stream(server, pcm, "seed=3&overlap=0.25&window=1024",
                           chunk_sizes=(400, 1601, 999, 10**9))
        assert out.shape == (n,)
        assert np.isfinite(out.astype(np.float64)).all()
        # deterministic per seed regardless of arrival chunking
        out2 = self._stream(server, pcm, "seed=3&overlap=0.25&window=1024",
                            chunk_sizes=(5000,))
        np.testing.assert_array_equal(out, out2)

    def test_stream_session_guard_truncates(self, tiny_ckpt):
        """--max_stream_seconds: a stream outliving the cap is finalized from
        the audio fed so far (valid chunked response, shorter than the input)
        and the connection is closed instead of hanging forever."""
        import http.client

        base, proc, log_f = _launch_server(tiny_ckpt, 29778,
                                           ("--max_stream_seconds", "1.0"))
        try:
            host = base.split("//")[1]
            n = 4096
            x = (0.25 * np.sin(2 * np.pi * 330 * np.arange(n) / 16000.0))
            pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
            conn = http.client.HTTPConnection(host, timeout=120)
            try:
                conn.putrequest("POST", "/enhance_stream?seed=1&window=1024"
                                        "&overlap=0")
                conn.putheader("Transfer-Encoding", "chunked")
                conn.endheaders()
                # continuous slow feed outliving the 1.0 s cap: 20 pieces over
                # ~2 s; the server truncates mid-stream and bounded-drains the
                # tail, so every send lands on an open socket
                piece_len = len(pcm) // 20
                for i in range(20):
                    p = pcm[i * piece_len:(i + 1) * piece_len]
                    conn.send(f"{len(p):x}\r\n".encode() + p + b"\r\n")
                    time.sleep(0.1)
                conn.send(b"0\r\n\r\n")
                resp = conn.getresponse()
                assert resp.status == 200
                out = np.frombuffer(resp.read(), dtype="<i2")
                # truncated: some but not all of the input was enhanced
                assert 0 < out.size < n, out.size
            finally:
                conn.close()

            # silent client: one chunk then nothing — the socket read timeout
            # (min(60, max_stream_seconds)) must finalize the session instead
            # of pinning the handler thread forever
            conn = http.client.HTTPConnection(host, timeout=120)
            try:
                conn.putrequest("POST", "/enhance_stream?seed=1&window=1024"
                                        "&overlap=0")
                conn.putheader("Transfer-Encoding", "chunked")
                conn.endheaders()
                half = len(pcm) // 2
                conn.send(f"{half:x}\r\n".encode() + pcm[:half] + b"\r\n")
                # no terminal chunk, no more data
                resp = conn.getresponse()
                assert resp.status == 200
                out = np.frombuffer(resp.read(), dtype="<i2")
                assert out.size == n // 2, out.size
            finally:
                conn.close()
        finally:
            proc.kill()
            proc.wait(timeout=10)
            log_f.close()

    def test_stream_bad_window_is_400(self, server):
        import urllib.error

        req = urllib.request.Request(server + "/enhance_stream?window=1000",
                                     data=b"\x00\x00" * 100)
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

    def test_concurrent_requests_coalesce(self, server):
        """N parallel /enhance posts: all answered correctly; healthz shows the
        batcher issued <= N device passes for them."""
        import threading

        with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
            before = json.loads(r.read())
        body = _wav_bytes(n=2048, seed=9)
        outs = [None] * 4

        def hit(i):
            req = urllib.request.Request(server + "/enhance?seed=11", data=body)
            with urllib.request.urlopen(req, timeout=120) as r:
                outs[i] = r.read()

        ts = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert all(o is not None for o in outs)
        assert all(o == outs[0] for o in outs)  # same seed -> identical wavs
        with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
            after = json.loads(r.read())
        assert after["requests"] - before["requests"] == 4
        assert after["batches"] - before["batches"] <= 4


class TestServeOverlap:
    def test_enhance_with_overlap(self, server):
        from scipy.io import wavfile

        req = urllib.request.Request(server + "/enhance?seed=2&overlap=0.25",
                                     data=_wav_bytes(n=2500))
        with urllib.request.urlopen(req, timeout=120) as r:
            rate, enh = wavfile.read(io.BytesIO(r.read()))
        assert enh.shape == (2500,) and np.all(np.isfinite(enh))

    def test_bad_overlap_is_400(self, server):
        req = urllib.request.Request(server + "/enhance?overlap=0.9",
                                     data=_wav_bytes(n=2000))
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400


class TestServeOps:
    """Operations surface: /metrics exposition and /admin/reload hot swap."""

    def test_metrics_and_reload(self, tiny_ckpt):
        base, proc, log_f = _launch_server(tiny_ckpt, 29782)
        try:
            with urllib.request.urlopen(base + "/metrics", timeout=10) as r:
                assert r.status == 200
                text = r.read().decode()
            assert "segan_requests_total 0" in text
            assert "segan_reloads_total 0" in text

            body = _wav_bytes(n=2048, seed=3)
            req = urllib.request.Request(base + "/enhance?seed=9", data=body)
            with urllib.request.urlopen(req, timeout=120) as r:
                out_before = r.read()
            with urllib.request.urlopen(base + "/metrics", timeout=10) as r:
                text = r.read().decode()
            assert "segan_requests_total 1" in text
            sum_line = next(ln for ln in text.splitlines()
                            if ln.startswith("segan_enhance_seconds_sum"))
            assert float(sum_line.split()[1]) > 0

            # build a SECOND checkpoint with different weights
            import jax as _jax

            from segan_pytorch_tpu.utils.config import SEGANConfig
            from segan_pytorch_tpu.models import SEGAN
            from segan_pytorch_tpu.utils.checkpoint import Saver

            alt = tiny_ckpt / "alt"
            alt.mkdir(exist_ok=True)
            cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                              genc_poolings=[4, 4, 4], z_dim=32,
                              denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                              dpool_slen=16, batch_size=1,
                              save_path=str(alt))
            s2 = SEGAN(cfg)
            s2.init_state(_jax.random.PRNGKey(99), batch_size=1)
            s2.save(Saver(str(alt), prefix="EOE_G-"),
                    Saver(str(alt), prefix="EOE_D-"), 1)

            # bad path -> 500, old engine keeps serving
            req = urllib.request.Request(
                base + "/admin/reload",
                data=json.dumps({"g_ckpt": "/nonexistent.ckpt"}).encode())
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=60)
            assert ei.value.code == 500
            req = urllib.request.Request(base + "/enhance?seed=9", data=body)
            with urllib.request.urlopen(req, timeout=120) as r:
                assert r.read() == out_before  # unchanged engine

            def counter(name):
                with urllib.request.urlopen(base + "/metrics", timeout=10) as r:
                    for ln in r.read().decode().splitlines():
                        if ln.startswith(name + " "):
                            return float(ln.split()[1])
                raise AssertionError(f"{name} not exposed")

            passes_before = counter("segan_device_passes_total")
            assert passes_before >= 1

            # real reload -> same request now produces DIFFERENT audio
            req = urllib.request.Request(
                base + "/admin/reload",
                data=json.dumps({
                    "g_ckpt": str(alt / "weights_EOE_G-Generator-1.ckpt"),
                }).encode())
            with urllib.request.urlopen(req, timeout=180) as r:
                info = json.loads(r.read())
            assert info["status"] == "reloaded" and info["reloads"] == 1
            # Prometheus counters MUST NOT regress across a reload: the
            # retiring generation's passes fold into *_prev at swap time
            # (serving_soak.py caught the 150 s regression window)
            assert counter("segan_device_passes_total") >= passes_before
            req = urllib.request.Request(base + "/enhance?seed=9", data=body)
            with urllib.request.urlopen(req, timeout=120) as r:
                out_after = r.read()
            assert out_after != out_before
            with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
                h = json.loads(r.read())
            assert h["reloads"] == 1
            # the new generation's pass counter is live immediately; the
            # retired batcher's passes fold into batches_prev only when it is
            # closed (~150 s grace), so just the post-reload pass shows here
            assert h["batches"] >= 1
        finally:
            proc.kill()
            proc.wait(timeout=10)
            log_f.close()

    def test_reload_requires_auth(self, tiny_ckpt):
        base, proc, log_f = _launch_server(
            tiny_ckpt, 29783, ("--auth_token", "tok"))
        try:
            req = urllib.request.Request(
                base + "/admin/reload",
                data=json.dumps({"g_ckpt": "x"}).encode())
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 401
        finally:
            proc.kill()
            proc.wait(timeout=10)
            log_f.close()


class TestServeDeployment:
    """Deployment extras: bearer-token auth, TLS, graceful SIGTERM drain."""

    def test_auth_token(self, tiny_ckpt):
        base, proc, log_f = _launch_server(
            tiny_ckpt, 29779, ("--auth_token", "sekrit-42"))
        try:
            # healthz stays open (LB probes) and reports auth enabled
            with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
                info = json.loads(r.read())
            assert info["auth"] is True
            body = _wav_bytes(n=2048)
            # no token / wrong token -> 401 with WWW-Authenticate
            for hdrs in ({}, {"Authorization": "Bearer wrong"},
                         {"Authorization": "Basic sekrit-42"}):
                req = urllib.request.Request(base + "/enhance", data=body,
                                             headers=hdrs)
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=30)
                assert ei.value.code == 401
                assert ei.value.headers["WWW-Authenticate"] == "Bearer"
            req = urllib.request.Request(
                base + "/enhance_stream?window=1024", data=b"\x00\x00" * 512)
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 401
            # non-ASCII token must be a clean 401, not a TypeError-crashed
            # connection (headers are latin-1 decoded server-side)
            req = urllib.request.Request(
                base + "/enhance", data=body,
                headers={"Authorization": "Bearer f\xf6o"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 401
            # correct token -> 200
            req = urllib.request.Request(
                base + "/enhance?seed=1", data=body,
                headers={"Authorization": "Bearer sekrit-42"})
            with urllib.request.urlopen(req, timeout=120) as r:
                assert r.status == 200
                assert len(r.read()) > 0
        finally:
            proc.kill()
            proc.wait(timeout=10)
            log_f.close()

    def test_tls(self, tiny_ckpt, tmp_path):
        import shutil

        if shutil.which("openssl") is None:
            pytest.skip("openssl CLI not available to mint a test cert")
        cert = tmp_path / "cert.pem"
        key = tmp_path / "key.pem"
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
             "-keyout", str(key), "-out", str(cert), "-days", "1",
             "-subj", "/CN=localhost"],
            check=True, capture_output=True)
        base, proc, log_f = _launch_server(
            tiny_ckpt, 29780,
            ("--tls_cert", str(cert), "--tls_key", str(key)), scheme="https")
        try:
            from scipy.io import wavfile

            ctx = _unverified_ctx()
            req = urllib.request.Request(base + "/enhance?seed=4",
                                         data=_wav_bytes(n=2048))
            with urllib.request.urlopen(req, timeout=120, context=ctx) as r:
                assert r.status == 200
                rate, enh = wavfile.read(io.BytesIO(r.read()))
            assert rate == 16000 and enh.shape == (2048,)
            assert np.all(np.isfinite(enh))
        finally:
            proc.kill()
            proc.wait(timeout=10)
            log_f.close()

    def test_graceful_sigterm(self, tiny_ckpt):
        import signal as _signal
        import threading

        base, proc, log_f = _launch_server(tiny_ckpt, 29781)
        try:
            results = {}

            def hit():
                req = urllib.request.Request(base + "/enhance?seed=7",
                                             data=_wav_bytes(n=2048))
                try:
                    with urllib.request.urlopen(req, timeout=120) as r:
                        results["status"] = r.status
                        results["n"] = len(r.read())
                except Exception as e:  # pragma: no cover - failure detail
                    results["error"] = repr(e)

            t = threading.Thread(target=hit)
            t.start()
            time.sleep(0.05)  # let the request reach the server
            proc.send_signal(_signal.SIGTERM)
            t.join(timeout=120)
            # the in-flight request is answered, not cut
            assert results.get("status") == 200, results
            assert results["n"] > 0
            assert proc.wait(timeout=30) == 0  # clean exit after drain
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait(timeout=10)
            log_f.close()
        log_text = (tiny_ckpt / "server_29781.log").read_text()
        assert "shutdown complete" in log_text


class TestServeWebSocket:
    """WebSocket flavor of /enhance_stream (--ws_port): keepalive through
    input gaps, parity with the chunked-HTTP endpoint, auth, error paths."""

    @pytest.fixture(scope="class")
    def ws_server(self, tiny_ckpt):
        # aggressive 0.3 s ping interval so the gap test exercises several
        # keepalive rounds in ~1 s of idle time
        base, proc, log_f = _launch_server(
            tiny_ckpt, 29784,
            ("--ws_port", "29884", "--ws_ping_interval", "0.3"))
        yield base, 29884
        proc.kill()
        proc.wait(timeout=10)
        log_f.close()

    @staticmethod
    def _pcm(n=2500, seed=5):
        rng = np.random.RandomState(seed)
        t = np.arange(n) / 16000.0
        x = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.randn(n)
        return (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()

    @staticmethod
    def _ws_stream(port, pcm_bytes, query, pieces, gap=0.0, token=None):
        """Feed pcm_bytes over the WebSocket in `pieces`-sized binary frames
        (sleeping `gap` seconds between them), send 'end', and collect the
        enhanced PCM + the final JSON 'done' frame."""
        from websockets.sync.client import connect

        headers = {"Authorization": f"Bearer {token}"} if token else None
        out = b""
        done = None
        with connect(f"ws://127.0.0.1:{port}/enhance_stream?{query}",
                     additional_headers=headers, open_timeout=60) as ws:
            pos = 0
            for sz in pieces:
                piece = pcm_bytes[pos: pos + sz]
                pos += len(piece)
                if piece:
                    ws.send(piece)
                if gap:
                    time.sleep(gap)
            if pos < len(pcm_bytes):
                ws.send(pcm_bytes[pos:])
            ws.send("end")
            while True:
                msg = ws.recv(timeout=120)
                if isinstance(msg, str):
                    done = json.loads(msg)
                    break
                out += msg
        return np.frombuffer(out, dtype="<i2"), done

    def test_ws_matches_http_stream_and_survives_idle_gaps(self, ws_server):
        """The WS endpoint produces byte-identical PCM to the chunked-HTTP
        endpoint for the same seed, even when the client goes silent for
        several ping intervals mid-stream (the keepalive gap chunked HTTP
        cannot cover)."""
        base, ws_port = ws_server
        n = 2500
        pcm = self._pcm(n)
        query = "seed=3&overlap=0.25&window=1024"
        # HTTP chunked reference on the SAME server process
        import http.client

        conn = http.client.HTTPConnection(base.split("//")[1], timeout=120)
        try:
            conn.putrequest("POST", "/enhance_stream?" + query)
            conn.putheader("Transfer-Encoding", "chunked")
            conn.endheaders()
            conn.send(f"{len(pcm):x}\r\n".encode() + pcm + b"\r\n0\r\n\r\n")
            resp = conn.getresponse()
            assert resp.status == 200
            http_out = np.frombuffer(resp.read(), dtype="<i2")
        finally:
            conn.close()
        # WS with ~1.2 s of idle gaps (4 ping intervals) spread over the feed
        ws_out, done = self._ws_stream(ws_port, pcm, query,
                                       pieces=(800, 1602, 998), gap=0.4)
        assert done["event"] == "done"
        assert not done["truncated"]
        assert done["samples_out"] == n
        assert ws_out.shape == (n,)
        np.testing.assert_array_equal(ws_out, http_out)

    def test_ws_deterministic_per_seed(self, ws_server):
        _, ws_port = ws_server
        pcm = self._pcm(2048, seed=7)
        a, _ = self._ws_stream(ws_port, pcm, "seed=11&window=1024",
                               pieces=(4096,))
        b, _ = self._ws_stream(ws_port, pcm, "seed=11&window=1024",
                               pieces=(100, 3000, 996))
        np.testing.assert_array_equal(a, b)

    def test_ws_bad_window_closes_1008(self, ws_server):
        from websockets.exceptions import ConnectionClosedError
        from websockets.sync.client import connect

        _, ws_port = ws_server
        with pytest.raises(ConnectionClosedError) as ei:
            with connect(f"ws://127.0.0.1:{ws_port}/enhance_stream"
                         f"?window=1000", open_timeout=60) as ws:
                ws.recv(timeout=30)
        assert ei.value.rcvd.code == 1008

    def test_ws_unknown_path_closes_1008(self, ws_server):
        from websockets.exceptions import ConnectionClosedError
        from websockets.sync.client import connect

        _, ws_port = ws_server
        with pytest.raises(ConnectionClosedError) as ei:
            with connect(f"ws://127.0.0.1:{ws_port}/other",
                         open_timeout=60) as ws:
                ws.recv(timeout=30)
        assert ei.value.rcvd.code == 1008

    def test_ws_auth_token(self, tiny_ckpt):
        from websockets.exceptions import ConnectionClosedError
        from websockets.sync.client import connect

        base, proc, log_f = _launch_server(
            tiny_ckpt, 29785,
            ("--ws_port", "29885", "--auth_token", "ws-sekrit"))
        try:
            # no token -> policy-violation close before any audio is read
            with pytest.raises(ConnectionClosedError) as ei:
                with connect("ws://127.0.0.1:29885/enhance_stream",
                             open_timeout=60) as ws:
                    ws.recv(timeout=30)
            assert ei.value.rcvd.code == 1008
            # correct bearer token -> full roundtrip
            pcm = self._pcm(1500)
            out, done = self._ws_stream(29885, pcm, "seed=1&window=1024",
                                        pieces=(3000,), token="ws-sekrit")
            assert out.shape == (1500,)
            assert done["samples_out"] == 1500
        finally:
            proc.kill()
            proc.wait(timeout=10)
            log_f.close()

    def test_ws_client_tool_roundtrip(self, ws_server, tmp_path):
        """tools/ws_client.py end-to-end: wav in -> streamed enhancement ->
        wav out, byte-identical to a direct WS stream with the same seed."""
        from scipy.io import wavfile

        _, ws_port = ws_server
        n = 2400
        pcm = self._pcm(n, seed=3)
        wav_in = tmp_path / "in.wav"
        wav_out = tmp_path / "out.wav"
        wavfile.write(str(wav_in), 16000, np.frombuffer(pcm, dtype="<i2"))
        env = dict(os.environ, SEGAN_TPU_PLATFORM="cpu", PYTHONPATH=REPO)
        r = subprocess.run(
            [sys.executable, "tools/ws_client.py",
             "--url", f"ws://127.0.0.1:{ws_port}/enhance_stream",
             "--in", str(wav_in), "--out", str(wav_out),
             "--seed", "21", "--window", "1024", "--overlap", "0.25",
             "--piece_ms", "40", "--realtime", "4.0"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        info = json.loads(r.stdout.strip().splitlines()[-1])
        assert info["samples_in"] == info["samples_out"] == n
        assert not info["truncated"]
        rate, enh = wavfile.read(str(wav_out))
        assert rate == 16000 and enh.shape == (n,)
        direct, _ = self._ws_stream(ws_port, pcm,
                                    "seed=21&window=1024&overlap=0.25",
                                    pieces=(len(pcm),))
        np.testing.assert_array_equal(enh, direct)

    def test_ws_active_sender_does_not_block_sigterm_drain(self, tiny_ckpt):
        """A WS client that never stops sending must not pin the process past
        the drain: 'draining' is checked every loop iteration, the session is
        finalized (truncated done frame), and the server exits 0 — WS
        connection threads are non-daemon, so without the in-loop check the
        process would hang until max_stream_seconds."""
        import signal as _signal
        import threading

        from websockets.sync.client import connect

        base, proc, log_f = _launch_server(
            tiny_ckpt, 29787,
            ("--ws_port", "29887", "--drain_seconds", "10"))
        try:
            pcm = self._pcm(1024)
            got = {}

            def client():
                try:
                    with connect("ws://127.0.0.1:29887/enhance_stream"
                                 "?seed=1&window=1024",
                                 open_timeout=60) as ws:
                        got["connected"] = True
                        for _ in range(600):  # keeps sending through SIGTERM
                            ws.send(pcm)
                            msg = None
                            # drain anything queued; stop on the done frame
                            try:
                                while True:
                                    msg = ws.recv(timeout=0.05)
                                    if isinstance(msg, str):
                                        got["done"] = json.loads(msg)
                                        return
                            except TimeoutError:
                                pass
                            time.sleep(0.05)
                except Exception as e:
                    got["exc"] = repr(e)

            t = threading.Thread(target=client)
            t.start()
            deadline = time.time() + 60
            while not got and time.time() < deadline:
                time.sleep(0.1)
            assert got.get("connected"), got
            time.sleep(0.5)  # let a few frames flow
            proc.send_signal(_signal.SIGTERM)
            # clean exit well within drain + shutdown overhead
            assert proc.wait(timeout=60) == 0
            t.join(timeout=60)
            # the session was finalized mid-stream, not cut: either the client
            # collected the truncated done frame or saw a clean close
            if "done" in got:
                assert got["done"]["truncated"] is True
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait(timeout=10)
            log_f.close()


class TestServeMutualTLS:
    def test_mtls_requires_client_cert(self, tiny_ckpt, tmp_path):
        """--tls_client_ca: a client without a CA-signed cert fails the TLS
        handshake; one presenting it gets a normal 200 (HTTP and WS)."""
        import shutil
        import ssl

        if shutil.which("openssl") is None:
            pytest.skip("openssl CLI not available to mint test certs")

        def mint(name, cn):
            cert, key = tmp_path / f"{name}.pem", tmp_path / f"{name}.key"
            subprocess.run(
                ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
                 "-keyout", str(key), "-out", str(cert), "-days", "1",
                 "-subj", f"/CN={cn}"], check=True, capture_output=True)
            return cert, key

        srv_cert, srv_key = mint("server", "localhost")
        # self-signed client cert doubling as its own CA: the server trusts
        # exactly this identity
        cli_cert, cli_key = mint("client", "segan-client")
        launch_ctx = _unverified_ctx()  # health probe must present the cert
        launch_ctx.load_cert_chain(str(cli_cert), str(cli_key))
        base, proc, log_f = _launch_server(
            tiny_ckpt, 29786,
            ("--tls_cert", str(srv_cert), "--tls_key", str(srv_key),
             "--tls_client_ca", str(cli_cert), "--ws_port", "29886"),
            scheme="https", client_ctx=launch_ctx)
        try:
            # no client cert -> handshake rejected
            with pytest.raises((ssl.SSLError, urllib.error.URLError,
                                ConnectionError, OSError)):
                urllib.request.urlopen(base + "/healthz", timeout=10,
                                       context=_unverified_ctx())
            # with the client cert -> healthz + enhance work
            ctx = _unverified_ctx()
            ctx.load_cert_chain(str(cli_cert), str(cli_key))
            with urllib.request.urlopen(base + "/healthz", timeout=10,
                                        context=ctx) as r:
                assert r.status == 200
            req = urllib.request.Request(base + "/enhance?seed=1",
                                         data=_wav_bytes(n=2048))
            with urllib.request.urlopen(req, timeout=120, context=ctx) as r:
                assert r.status == 200
                assert len(r.read()) > 0
            # the WS listener shares the mTLS context. Under TLS 1.3 the
            # certificate_required alert lands AFTER the client-side
            # handshake returns, so the rejection may surface as a closed
            # connection on first use rather than an SSLError
            from websockets.exceptions import ConnectionClosed, \
                InvalidHandshake
            from websockets.sync.client import connect

            with pytest.raises((ssl.SSLError, OSError, InvalidHandshake,
                                TimeoutError, ConnectionClosed)):
                with connect("wss://127.0.0.1:29886/enhance_stream",
                             ssl=_unverified_ctx(), open_timeout=20) as ws:
                    ws.recv(timeout=10)
            pcm = (np.zeros(1500)).astype("<i2").tobytes()
            out = b""
            with connect("wss://127.0.0.1:29886/enhance_stream"
                         "?seed=1&window=1024", ssl=ctx,
                         open_timeout=60) as ws:
                ws.send(pcm)
                ws.send("end")
                while True:
                    msg = ws.recv(timeout=120)
                    if isinstance(msg, str):
                        done = json.loads(msg)
                        break
                    out += msg
            assert done["samples_out"] == 1500
            assert len(out) == 3000
        finally:
            proc.kill()
            proc.wait(timeout=10)
            log_f.close()


class TestServeWSEGAN:
    def test_wsegan_checkpoint_served_with_engine_semantics(
            self, tmp_path_factory):
        """A WSEGAN checkpoint behind serve.py: healthz reports the model, and
        /enhance output is bit-identical to the in-process WSEGAN.generate
        (single /1024-padded pass), proving the MicroBatcher routes to the
        engine's own semantics instead of SEGAN chunk grids."""
        from scipy.io import wavfile

        from segan_pytorch_tpu.utils.config import SEGANConfig
        from segan_pytorch_tpu.models import WSEGAN
        from segan_pytorch_tpu.utils.checkpoint import Saver
        from segan_pytorch_tpu.ops.signal import (normalize_wave_minmax,
                                                  pre_emphasize_np)
        import jax

        root = tmp_path_factory.mktemp("serve_ws")
        cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                          genc_poolings=[4, 4, 4], z_dim=32,
                          denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                          dpool_slen=16, batch_size=1, wsegan=True,
                          save_path=str(root))
        ws = WSEGAN(cfg)
        ws.init_state(batch_size=1)
        ws.save(Saver(str(root), prefix="EOE_G-"),
                Saver(str(root), prefix="EOE_D-"), 1)
        with open(root / "train.opts", "w") as f:
            f.write(cfg.to_json())

        base, proc, log_f = _launch_server(root, 29788)
        try:
            with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
                assert json.loads(r.read())["model"] == "WSEGAN"
            n = 2500  # NOT /1024-aligned: exercises the make_div padding
            body = _wav_bytes(n=n, seed=6)
            req = urllib.request.Request(base + "/enhance?seed=17", data=body)
            with urllib.request.urlopen(req, timeout=120) as r:
                rate, served = wavfile.read(io.BytesIO(r.read()))
            assert rate == 16000 and served.shape == (n,)
            # replicate the server's input prep, then the engine's own path
            _, wav = wavfile.read(io.BytesIO(body))
            pwav = pre_emphasize_np(
                np.asarray(normalize_wave_minmax(wav)), cfg.preemph)
            direct = ws.generate(pwav, rng=jax.random.PRNGKey(17))[0]
            np.testing.assert_array_equal(served, direct.astype(np.float32))
        finally:
            proc.kill()
            proc.wait(timeout=10)
            log_f.close()
