"""Real 2-process jax.distributed CPU cluster tests (VERDICT round-2
item 4): the multi-host branches — global-array batch assembly,
tile_index offsetting, object/ragged gathers, and a genuinely 2-host
validate_ret — executed in spawned worker processes
(tests/multihost_worker.py), with the merged retrieval report compared
against the single-host report over the same data."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def worker_reports(tmp_path_factory):
    out = tmp_path_factory.mktemp("mh")
    coord = f"127.0.0.1:{_free_port()}"
    script = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(rank), coord, str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout)
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log[-4000:]}"
        assert f"rank {rank}: OK" in log
    return out


class TestTwoProcessCluster:
    def test_workers_pass_all_checks(self, worker_reports):
        # shard_batch assembly, tile offsets, and object collectives are
        # asserted inside the workers; both must exit 0
        assert os.path.exists(worker_reports / "report_rank0.json")
        assert os.path.exists(worker_reports / "report_rank1.json")

    def test_ranks_agree(self, worker_reports):
        r0 = json.load(open(worker_reports / "report_rank0.json"))
        r1 = json.load(open(worker_reports / "report_rank1.json"))
        assert r0 == r1  # every host sees the merged gallery

    def test_trainer_2host(self, worker_reports):
        """The PRODUCTION Trainer ran 3 steps on the 2-process global mesh
        (build_model_and_state -> DevicePrefetcher/shard_batch -> orbax
        multihost checkpoint + rank-0 best-copy) with identical losses."""
        t0 = json.load(open(worker_reports / "trainer_rank0.json"))
        t1 = json.load(open(worker_reports / "trainer_rank1.json"))
        assert t0 == t1
        assert np.isfinite(t0["loss"])

    def test_dcn_ici_tp_composition(self, worker_reports):
        """DP over the process boundary (DCN) composed with Megatron TP
        inside each process (ICI) on a (data=2, model=2) mesh — the real
        VALOR train step with live TP shard asserts ran in both workers
        (check_dcn_ici_tp), identical finite losses on both ranks."""
        d0 = json.load(open(worker_reports / "dcn_ici_rank0.json"))
        d1 = json.load(open(worker_reports / "dcn_ici_rank1.json"))
        assert d0 == d1
        assert np.isfinite(d0["loss"])

    def test_merged_report_equals_single_host(self, worker_reports):
        """The 2-host merged retrieval report must equal a single-host
        eval over the same 7 items (gallery count == dataset size — the
        round-2 sampler dropped tail items)."""
        import jax

        from tests.conftest import tiny_model_config
        from tests.multihost_worker import _item_batch
        from valor_tpu.core.tasks import parse_task
        from valor_tpu.eval.validate import validate_ret
        from valor_tpu.models.valor import VALORModel
        from valor_tpu.train.step import make_eval_step

        cfg = tiny_model_config(
            fusion_vocab=512, txt_encoder_type="bert_base_uncased",
            init_clip_head=False,
        )
        model = VALORModel(cfg)
        spec = parse_task("ret%tv")
        init_batch = _item_batch([0, 1])
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            {k: v for k, v in init_batch.items() if k != "ids"},
            spec, True, True,
        )["params"]
        batches = [
            _item_batch([0, 1]), _item_batch([2, 3]), _item_batch([4, 5]),
            _item_batch([6]),
        ]
        single = validate_ret(
            model, params, make_eval_step(model), iter(batches), spec,
            cfg.contra_type,
        )
        merged = json.load(open(worker_reports / "report_rank0.json"))
        assert set(merged) == set(single)
        for k in single:
            np.testing.assert_allclose(merged[k], single[k], atol=1e-6, err_msg=k)
