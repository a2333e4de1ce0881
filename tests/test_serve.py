"""Serving engine tests: dynamic batching, bucket padding, program reuse.

The engine's correctness contract is that batching/padding decisions are
invisible in the outputs: a request's result must equal the same row of a
direct ``gen.generate`` call at the engine's bucket batch size (rows are
independent in every decode path, and same-bucket batches run the exact
same compiled program, so equality is exact — not approximate).
"""

import json
import threading

import jax
import numpy as np
import pytest

from tests.conftest import tiny_model_config
from tests.test_model import make_batch
from valor_tpu.eval import generate as gen
from valor_tpu.models.valor import VALORModel
from valor_tpu.serve import InferenceEngine, ServeConfig


def _setup(b=4):
    cfg = tiny_model_config()
    batch = make_batch(jax.random.PRNGKey(0), b=b)
    model = VALORModel(cfg)
    from valor_tpu.core.tasks import parse_task

    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        batch, parse_task("cap%tv"), True, True,
    )["params"]
    return model, params, batch


def _items(batch, n):
    pixels = np.asarray(batch["video_pixels"])
    return [{"video_pixels": pixels[i]} for i in range(n)]


class TestEngine:
    def test_results_match_direct_generate(self):
        model, params, batch = _setup()
        direct = np.asarray(
            gen.generate(model, params, {"video_pixels": batch["video_pixels"]},
                         ("tv",), max_len=5)["generated_sequences_tv"]
        )
        cfg = ServeConfig(buckets=(4,), max_wait_ms=-1, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            futs = [eng.submit(it) for it in _items(batch, 4)]
            results = [f.result(timeout=120) for f in futs]
        for i, r in enumerate(results):
            np.testing.assert_array_equal(r["sequences"], direct[i])
            assert r["batch_size"] == 4 and r["bucket"] == 4
        s = eng.stats()
        assert s["requests"] == 4 and s["batches"] == 1
        assert s["pad_fraction"] == 0.0 and s["mean_occupancy"] == 1.0

    def test_uint8_rows_match_fp32_direct_generate(self):
        """The production serving contract (cli/serve.py featurize) ships
        raw uint8 pixel rows; the (x/255-mean)/std normalisation fuses
        into the on-device patch embed (models/valor.py encode_video).
        The engine's uint8 outputs must be IDENTICAL to a direct fp32
        generate over the host-normalised values — same IEEE ops in the
        same order on both paths."""
        from valor_tpu.data.pipeline import CLIP_MEAN, CLIP_STD

        model, params, batch = _setup()
        shape = np.asarray(batch["video_pixels"]).shape
        u8 = np.random.RandomState(3).randint(
            0, 256, size=shape, dtype=np.uint8)
        f32 = (
            u8.astype(np.float32) / 255.0
            - np.asarray(CLIP_MEAN, np.float32)
        ) / np.asarray(CLIP_STD, np.float32)
        direct = np.asarray(
            gen.generate(model, params, {"video_pixels": f32},
                         ("tv",), max_len=5)["generated_sequences_tv"]
        )
        cfg = ServeConfig(buckets=(4,), max_wait_ms=-1, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            futs = [eng.submit({"video_pixels": u8[i]}) for i in range(4)]
            results = [f.result(timeout=120) for f in futs]
        for i, r in enumerate(results):
            np.testing.assert_array_equal(r["sequences"], direct[i])

    def test_bucket_padding_and_slicing(self):
        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])
        # the engine pads 3 -> bucket 4 by repeating row 0; the direct call
        # with the identical padded batch is the exact same program+math
        padded = np.stack([pixels[0], pixels[1], pixels[2], pixels[0]])
        direct = np.asarray(
            gen.generate(model, params, {"video_pixels": padded}, ("tv",),
                         max_len=5)["generated_sequences_tv"]
        )
        cfg = ServeConfig(buckets=(1, 4), max_wait_ms=50, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            futs = [eng.submit({"video_pixels": pixels[i]}) for i in range(3)]
            results = [f.result(timeout=120) for f in futs]
        # all three must have been coalesced (occupancy 3/4), not run 1+1+1
        s = eng.stats()
        assert s["batches"] == 1 and s["rows_run"] == 4 and s["rows_real"] == 3
        assert s["pad_fraction"] == pytest.approx(0.25)
        for i, r in enumerate(results):
            np.testing.assert_array_equal(r["sequences"], direct[i])

    def test_steady_state_zero_retrace(self):
        model, params, batch = _setup()
        cfg = ServeConfig(buckets=(4,), max_wait_ms=-1, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            for _ in range(3):  # three full batches, same shapes
                futs = [eng.submit(it) for it in _items(batch, 4)]
                [f.result(timeout=120) for f in futs]
            s = eng.stats()
        assert s["batches"] == 3
        decode_sizes = [v for k, v in s["compiled_programs"].items() if "decode" in k]
        assert decode_sizes and all(v == 1 for v in decode_sizes), s[
            "compiled_programs"
        ]  # one shape-specialisation total: batches 2..3 hit the cache

    def test_lanes_do_not_mix(self):
        # different max_len -> different compiled program -> separate lanes
        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])
        cfg = ServeConfig(buckets=(1, 4), max_wait_ms=20, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            f5 = eng.submit({"video_pixels": pixels[0]})
            f7 = eng.submit({"video_pixels": pixels[1]}, max_len=7)
            r5, r7 = f5.result(timeout=120), f7.result(timeout=120)
        assert r5["sequences"].shape == (5,)
        assert r7["sequences"].shape == (7,)
        assert eng.stats()["batches"] == 2

    def test_concurrent_submitters(self):
        model, params, batch = _setup()
        direct = np.asarray(
            gen.generate(model, params, {"video_pixels": batch["video_pixels"]},
                         ("tv",), max_len=5)["generated_sequences_tv"]
        )
        cfg = ServeConfig(buckets=(4,), max_wait_ms=200, group="tv", max_len=5)
        results = {}
        with InferenceEngine(model, params, cfg) as eng:
            def worker(i):
                r = eng.generate({"video_pixels": np.asarray(batch["video_pixels"])[i]})
                results[i] = r["sequences"]

            threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
            [t.start() for t in threads]
            [t.join() for t in threads]
        for i in range(4):
            np.testing.assert_array_equal(results[i], direct[i])

    def test_bad_item_rejected(self):
        model, params, batch = _setup()
        cfg = ServeConfig(buckets=(1,), max_wait_ms=0, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            with pytest.raises(KeyError):
                eng.submit({"video_pixel": np.zeros((2, 32, 32, 3))})
            with pytest.raises(ValueError):
                eng.submit({"video_pixels": np.zeros((32, 32, 3))})  # rank 3
            with pytest.raises(ValueError):
                eng.submit({})

    def test_back_to_back_batches_overlap_path(self):
        """Three bucket-fulls submitted at once exercise the
        double-buffered worker's overlap path (launch N+1 dispatched
        before N's results are forced); every request must still get its
        own row, equal to the direct generate."""
        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])
        direct = np.asarray(
            gen.generate(model, params, {"video_pixels": pixels[:2]},
                         ("tv",), max_len=5)["generated_sequences_tv"]
        )
        cfg = ServeConfig(buckets=(2,), max_wait_ms=-1, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            futs = [eng.submit({"video_pixels": pixels[i % 2]})
                    for i in range(6)]
            results = [f.result(timeout=300) for f in futs]
        for i, r in enumerate(results):
            np.testing.assert_array_equal(r["sequences"], direct[i % 2])
        assert eng.stats()["batches"] == 3

    def test_cancelled_queued_request_skipped_at_pick(self):
        """A request cancelled while queued must not occupy a batch row
        or device time: the batch that runs carries only live rows."""
        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])
        cfg = ServeConfig(buckets=(4,), max_wait_ms=200.0, group="tv",
                          max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            f0 = eng.submit({"video_pixels": pixels[0]})
            f1 = eng.submit({"video_pixels": pixels[1]})
            assert f1.cancel()  # below bucket + young -> still queued
            f2 = eng.submit({"video_pixels": pixels[2]})
            r0 = f0.result(timeout=300)
            r2 = f2.result(timeout=300)
            s = eng.stats()
        assert r0["sequences"].shape == (5,) and r2["sequences"].shape == (5,)
        assert f1.cancelled()
        # only the two live rows were real work
        assert s["rows_real"] == 2, s

    def test_partial_lane_not_starved_by_hot_full_lane(self):
        """While full batches stream on one lane, an aged partial request
        on a DIFFERENT lane (other tensor signature) must still launch —
        within about one batch cycle, not after the hot lane drains."""
        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])
        cfg = ServeConfig(buckets=(2,), max_wait_ms=0.0, group="tv",
                          max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            # hot lane: keep 3 full bucket-2 batches queued
            hot = [eng.submit({"video_pixels": pixels[i % 2]})
                   for i in range(6)]
            # lone request on a second lane (different max_len -> its own
            # compatibility key), submitted while the hot lane is busy
            lone = eng.submit({"video_pixels": pixels[2]}, max_len=4)
            assert lone.result(timeout=300)["sequences"].shape == (4,)
            [f.result(timeout=300) for f in hot]

    def test_run_error_surfaces_in_future(self):
        # wrong resolution compiles/encodes against a 32px model -> the
        # worker must deliver the exception to THIS request's future and
        # keep serving later requests
        model, params, batch = _setup()
        cfg = ServeConfig(buckets=(1, 4), max_wait_ms=0, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            bad = eng.submit({"video_pixels": np.zeros((2, 16, 16, 3), np.float32)})
            with pytest.raises(Exception):
                bad.result(timeout=120)
            ok = eng.submit({"video_pixels": np.asarray(batch["video_pixels"])[0]})
            assert ok.result(timeout=120)["sequences"].shape == (5,)

    def test_shutdown_drains(self):
        model, params, batch = _setup()
        cfg = ServeConfig(buckets=(4,), max_wait_ms=-1, group="tv", max_len=5)
        eng = InferenceEngine(model, params, cfg)
        futs = [eng.submit(it) for it in _items(batch, 2)]  # never fills bucket
        eng.shutdown()  # drain launches the partial batch
        for f in futs:
            assert f.result(timeout=0)["sequences"].shape == (5,)
        with pytest.raises(RuntimeError):
            eng.submit(_items(batch, 1)[0])


class TestHTTP:
    def test_http_roundtrip_and_stats(self):
        import urllib.request

        from valor_tpu.cli.serve import start_server

        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])
        direct = np.asarray(
            gen.generate(model, params, {"video_pixels": pixels[:1]}, ("tv",),
                         max_len=5)["generated_sequences_tv"]
        )[0]

        def featurize(payload):
            # test stand-in for the ffmpeg/mapper path: pick a fixture row
            return {"video_pixels": pixels[int(payload["row"])]}

        def decode(seq):
            return " ".join(str(int(t)) for t in seq)

        cfg = ServeConfig(buckets=(1, 4), max_wait_ms=5, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            server = start_server(eng, featurize, decode, port=0)
            try:
                host, port = server.server_address

                def post(path, payload):
                    req = urllib.request.Request(
                        f"http://{host}:{port}{path}",
                        data=json.dumps(payload).encode(),
                        headers={"Content-Type": "application/json"},
                    )
                    with urllib.request.urlopen(req) as r:
                        return r.status, json.loads(r.read())

                code, out = post("/generate", {"row": 0})
                assert code == 200
                assert out["text"] == decode(direct)
                assert out["bucket"] in (1, 4)

                with urllib.request.urlopen(f"http://{host}:{port}/healthz") as r:
                    assert json.loads(r.read()) == {"ok": True}
                with urllib.request.urlopen(f"http://{host}:{port}/stats") as r:
                    stats = json.loads(r.read())
                assert stats["requests"] >= 1 and stats["batches"] >= 1

                # a bad payload is a 400 with the error surfaced, not a hang
                import urllib.error

                try:
                    post("/generate", {"no_row": True})
                    raise AssertionError("expected HTTPError")
                except urllib.error.HTTPError as e:
                    assert e.code == 400
                    assert "error" in json.loads(e.read())
            finally:
                server.shutdown()

    def test_http_concurrent_requests_batch(self):
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        from valor_tpu.cli.serve import start_server

        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])
        direct = np.asarray(
            gen.generate(model, params, {"video_pixels": pixels}, ("tv",),
                         max_len=5)["generated_sequences_tv"]
        )

        def featurize(payload):
            return {"video_pixels": pixels[int(payload["row"])]}

        def decode(seq):
            return " ".join(str(int(t)) for t in seq)

        cfg = ServeConfig(buckets=(4,), max_wait_ms=2000, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            server = start_server(eng, featurize, decode, port=0)
            try:
                host, port = server.server_address

                def post(row):
                    req = urllib.request.Request(
                        f"http://{host}:{port}/generate",
                        data=json.dumps({"row": row}).encode(),
                    )
                    with urllib.request.urlopen(req, timeout=120) as r:
                        return json.loads(r.read())

                with ThreadPoolExecutor(4) as pool:
                    outs = list(pool.map(post, range(4)))
                for i, out in enumerate(outs):
                    assert out["text"] == decode(direct[i])
                    assert out["batch_size"] == 4  # coalesced, not serial
            finally:
                server.shutdown()


class TestAdmission:
    def test_overload_sheds_with_503_semantics(self):
        # engine-level: past max_pending, submit raises EngineOverloaded
        # instead of growing the lane deque without bound
        from valor_tpu.serve import EngineOverloaded

        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])
        # max_wait_ms=-1 + bucket 4: nothing launches while we stuff the queue
        cfg = ServeConfig(buckets=(4,), max_wait_ms=-1, group="tv", max_len=5,
                          max_pending=3)
        eng = InferenceEngine(model, params, cfg)
        try:
            futs = [eng.submit({"video_pixels": pixels[i % 4]}) for i in range(3)]
            with pytest.raises(EngineOverloaded):
                eng.submit({"video_pixels": pixels[3]})
            assert eng.stats()["shed"] == 1
            assert eng.stats()["queue_depth"] == 3
            # capacity frees once the batch launches: add the 4th row so the
            # bucket fills and everything drains
            cfg2 = eng.cfg
            assert cfg2.max_pending == 3
        finally:
            eng.shutdown()  # drain launches the partial batch
        for f in futs:
            assert f.result(timeout=0)["sequences"].shape == (5,)

    def test_cancelled_future_does_not_poison_batch(self):
        # a caller cancelling a queued request must not discard the other
        # requests' computed results (set_result on a cancelled future
        # raises InvalidStateError without the guard)
        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])
        cfg = ServeConfig(buckets=(4,), max_wait_ms=-1, group="tv", max_len=5)
        eng = InferenceEngine(model, params, cfg)
        try:
            f0 = eng.submit({"video_pixels": pixels[0]})
            f1 = eng.submit({"video_pixels": pixels[1]})
            assert f1.cancel()  # still queued -> cancellable
            f2 = eng.submit({"video_pixels": pixels[2]})
            f3 = eng.submit({"video_pixels": pixels[3]})
        finally:
            eng.shutdown()
        assert f0.result(timeout=0)["sequences"].shape == (5,)
        assert f2.result(timeout=0)["sequences"].shape == (5,)
        assert f3.result(timeout=0)["sequences"].shape == (5,)

    def test_phase_breakdown_in_stats(self):
        model, params, batch = _setup()
        cfg = ServeConfig(buckets=(4,), max_wait_ms=-1, group="tv", max_len=5)
        with InferenceEngine(model, params, cfg) as eng:
            futs = [eng.submit(it) for it in _items(batch, 4)]
            [f.result(timeout=120) for f in futs]
            s = eng.stats()
        assert set(s["batch_phase_mean_s"]) == {
            "assemble", "h2d", "device", "fanout"}
        assert s["batch_phase_mean_s"]["device"] > 0.0
        total = sum(s["batch_phase_fraction"].values())
        assert total == pytest.approx(1.0, abs=0.01)

    def test_engine_prompt_injection(self):
        # an engine built with prompts must produce the same outputs as a
        # direct generate call with the prompt in the batch
        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])
        prompt = np.asarray([[101, 7, 8, 9, 102]], np.int32)
        direct = np.asarray(
            gen.generate(model, params,
                         {"video_pixels": pixels,
                          "prompt_tokens_caption": prompt},
                         ("tv",), max_len=5)["generated_sequences_tv"]
        )
        cfg = ServeConfig(buckets=(4,), max_wait_ms=-1, group="tv", max_len=5)
        seen_batches = []
        with InferenceEngine(model, params, cfg, prompts={"tv": prompt}) as eng:
            # spy on the pinned generator: record the batch the engine
            # actually sends so a silently-dropped prompt cannot pass
            real_gen = eng._gen

            class _Spy:
                def generate(self, params, batch, groups, **kw):
                    seen_batches.append(dict(batch))
                    return real_gen.generate(params, batch, groups, **kw)

            eng._gen = _Spy()
            futs = [eng.submit(it) for it in _items(batch, 4)]
            results = [f.result(timeout=120) for f in futs]
        for i, r in enumerate(results):
            np.testing.assert_array_equal(r["sequences"], direct[i])
        assert seen_batches and all(
            np.array_equal(b.get("prompt_tokens_caption"), prompt)
            for b in seen_batches
        )


class TestHTTPErrors:
    def _server(self, max_pending=1024, **handler_kw):
        from valor_tpu.cli.serve import start_server

        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])

        def featurize(payload):
            if payload.get("boom"):
                raise OSError("backend exploded")  # internal -> 500
            return {"video_pixels": pixels[int(payload["row"])]}

        cfg = ServeConfig(buckets=(1, 4), max_wait_ms=5, group="tv", max_len=5,
                          max_pending=max_pending)
        eng = InferenceEngine(model, params, cfg)
        server = start_server(eng, featurize, lambda s: "x", port=0, **handler_kw)
        return eng, server

    @staticmethod
    def _post(server, payload, raw=None):
        import urllib.error
        import urllib.request

        host, port = server.server_address
        req = urllib.request.Request(
            f"http://{host}:{port}/generate",
            data=raw if raw is not None else json.dumps(payload).encode(),
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def test_error_code_contract(self):
        eng, server = self._server()
        try:
            code, out = self._post(server, {"row": 0})
            assert code == 200
            # validation errors -> 400
            code, out = self._post(server, {"row": "not-an-int"})
            assert code == 400 and "error" in out
            code, out = self._post(server, None, raw=b"{not json")
            assert code == 400
            # internal featurizer/engine failure -> 500, not 400
            code, out = self._post(server, {"boom": True})
            assert code == 500 and "OSError" in out["error"]
        finally:
            server.shutdown()
            eng.shutdown()

    def test_body_size_limit_413(self):
        eng, server = self._server(max_body_bytes=100)
        try:
            code, out = self._post(server, {"row": 0, "pad": "x" * 1000})
            assert code == 413 and "limit" in out["error"]
        finally:
            server.shutdown()
            eng.shutdown()

    def test_overload_returns_503(self):
        # deterministic shed: age trigger off (max_wait_ms=-1) + bucket 4
        # means a single queued request can never launch; with
        # max_pending=1 the second POST must shed with 503
        from valor_tpu.cli.serve import start_server

        model, params, batch = _setup()
        pixels = np.asarray(batch["video_pixels"])

        def featurize(payload):
            return {"video_pixels": pixels[int(payload["row"])]}

        cfg = ServeConfig(buckets=(4,), max_wait_ms=-1, group="tv", max_len=5,
                          max_pending=1)
        eng = InferenceEngine(model, params, cfg)
        server = start_server(eng, featurize, lambda s: "x", port=0)
        try:
            import threading as th

            first = {}

            def parked():
                first["resp"] = self._post(server, {"row": 0})

            t = th.Thread(target=parked)
            t.start()
            # wait until the parked request is queued
            for _ in range(200):
                if eng.stats()["queue_depth"] >= 1:
                    break
                import time as _t

                _t.sleep(0.01)
            code, out = self._post(server, {"row": 1})
            assert code == 503 and out.get("retry") is True
            s = eng.stats()
            assert s["shed"] >= 1 and s["queue_depth"] == 1
        finally:
            server.shutdown()
            eng.shutdown()  # drain launches the parked partial batch
            t.join(timeout=120)
        assert first["resp"][0] == 200
