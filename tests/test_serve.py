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
