"""Worker process for tests/test_multihost.py: joins a 2-process CPU
jax.distributed cluster and exercises every multi-host branch that is
dead code under a single process (VERDICT round-2 item 4):

  * shard_batch's make_array_from_process_local_data assembly + the
    tile_index global-row offsetting (parallel/mesh.py),
  * all_gather_objects / all_gather_lists / all_gather_ragged
    (parallel/collectives.py — analogue of the reference's pickle
    collectives, utils/distributed.py:99-157),
  * a genuinely 2-host validate_ret over ragged shards whose merged
    report is written for the parent to compare against single-host.

Usage: python tests/multihost_worker.py <rank> <coordinator> <out_dir>

(`_item_batch` is also imported by the parent test to build the
single-host reference run; everything executable lives in main().)
"""

import json
import os
import sys

import numpy as np


def _item_batch(indices):
    """Deterministic per-item eval batch (shared generator with the
    parent's single-host reference run)."""
    toks = []
    pixels = []
    for i in indices:
        r = np.random.RandomState(1000 + i)
        t = np.zeros(6, np.int32)
        t[0], t[4] = 101, 102
        t[1:4] = r.randint(106, 500, 3)
        toks.append(t)
        pixels.append(r.randn(1, 32, 32, 3).astype(np.float32))
    return {
        "ids": [f"item{i}" for i in indices],
        "bert_tokens": np.stack(toks),
        "video_pixels": np.stack(pixels),
    }


def check_shard_batch(jax, rank):
    import jax.numpy as jnp

    from valor_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(n_data=4, n_model=1)
    # each process holds ITS 2 media rows; tile maps 4 answer rows onto them
    local_media = np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 100 * rank
    local_tile = np.array([0, 0, 1, 1], np.int32)
    batch = {
        "video_pixels": local_media,
        "tile_index": local_tile,
        "sample_num": np.asarray(2),
    }
    dev = shard_batch(mesh, batch)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    total = jax.jit(lambda b: jnp.sum(b["video_pixels"]), out_shardings=rep)(dev)
    expect = float(np.arange(6).sum() * 2 + 100 * 6)
    assert abs(float(total) - expect) < 1e-5, (float(total), expect)
    # tile offsets: rank p's local question rows land at p * Q_local
    tile_global = np.asarray(jax.jit(lambda b: b["tile_index"], out_shardings=rep)(dev))
    np.testing.assert_array_equal(tile_global, [0, 0, 1, 1, 2, 2, 3, 3])
    # scalars replicate
    assert int(np.asarray(jax.device_get(dev["sample_num"]))) == 2


def check_object_collectives(rank):
    from valor_tpu.parallel import collectives as C

    out = C.all_gather_objects({"rank": rank, "payload": "x" * (10 + 40 * rank)})
    assert [o["rank"] for o in out] == [0, 1]
    assert len(out[1]["payload"]) == 50
    merged = C.all_gather_lists([f"r{rank}_{i}" for i in range(2 + rank)])
    assert merged == ["r0_0", "r0_1", "r1_0", "r1_1", "r1_2"]
    ragged = C.all_gather_ragged(np.full((3 + rank, 2), rank, np.float32))
    assert ragged.shape == (7, 2)
    assert (ragged[:3] == 0).all() and (ragged[3:] == 1).all()


def check_validate_ret(jax, rank, out_dir):
    from tests.conftest import tiny_model_config
    from valor_tpu.core.tasks import parse_task
    from valor_tpu.data.loader import ShardedBatchSampler
    from valor_tpu.eval.validate import validate_ret
    from valor_tpu.models.valor import VALORModel
    from valor_tpu.train.step import make_eval_step

    cfg = tiny_model_config(
        fusion_vocab=512, txt_encoder_type="bert_base_uncased", init_clip_head=False
    )
    model = VALORModel(cfg)
    spec = parse_task("ret%tv")
    init_batch = _item_batch([0, 1])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        {k: v for k, v in init_batch.items() if k != "ids"},
        spec, True, True,
    )["params"]
    # ragged shards over 7 items: rank0 -> 4 items, rank1 -> 3
    sampler = ShardedBatchSampler(
        n_items=7, batch_size=2, shard=rank, n_shards=2, shuffle=False
    )
    batches = [_item_batch(idx) for idx in sampler]
    report = validate_ret(
        model, params, make_eval_step(model), iter(batches), spec, cfg.contra_type
    )
    with open(os.path.join(out_dir, f"report_rank{rank}.json"), "w") as f:
        json.dump(report, f, sort_keys=True)


def check_gather_empty_shard(rank):
    """A host with an EMPTY eval shard (n_items < process_count) must
    still participate in every gather: before the global-metadata fix,
    it skipped all_gather_ragged while the other host blocked inside —
    a deadlock this check would turn into a rendezvous abort."""
    from valor_tpu.eval.validate import _gather_eval_features

    if rank == 0:
        feats_all = {
            "feat_t": [np.ones((1, 2, 4), np.float32)],
            "feat_v": [np.full((1, 3, 4), 2.0, np.float32)],
            "feat_a": [],
            "txt_tokens": [np.ones((1, 2), np.int32)],
        }
        ids, ids_txt = ["item0"], ["item0"]
    else:  # empty shard: zero batches ran
        feats_all = {"feat_t": [], "feat_v": [], "feat_a": [], "txt_tokens": []}
        ids, ids_txt = [], []
    feats, g_ids, g_ids_txt = _gather_eval_features(feats_all, ids, ids_txt)
    assert feats["feat_t"].shape == (1, 2, 4)
    assert feats["feat_v"].shape == (1, 3, 4)
    assert feats["feat_a"] is None
    assert g_ids == ["item0"] and g_ids_txt == ["item0"]


def check_validate_qa_cap_merge(rank):
    """validate_qa / validate_cap must score the MERGED prediction set so
    both hosts report the same dataset-level metric (pre-fix they scored
    the local shard only, diverging best-checkpoint tracking)."""
    import numpy as np

    from valor_tpu.core.tasks import parse_task
    from valor_tpu.eval import validate as V

    class StubTok:
        def decode(self, toks):
            return " ".join(str(t) for t in toks)

    spec = parse_task("cap%tv")
    # disjoint shards: rank0 has 2 rows (both correct), rank1 has 1 (wrong)
    seqs = {0: np.array([[5, 102], [6, 102]]), 1: np.array([[7, 102]])}
    answers = {0: ["5", "6"], 1: ["9"]}
    orig = V.gen.generate
    V.gen.generate = lambda *a, **k: {
        "generated_sequences_tv": seqs[rank],
        "logprobs_tv": None,
    }
    try:
        batches = [{
            "ids": [f"q{rank}_{i}" for i in range(len(seqs[rank]))],
            "answers": answers[rank],
        }]
        rep = V.validate_qa(None, None, iter(batches), spec, StubTok())
        assert rep["accuracy"] == round(100.0 * 2 / 3, 2), rep
        cap_batches = [{"ids": [f"q{rank}_{i}" for i in range(len(seqs[rank]))]}]
        anno = {f"q{r}_{i}": [a] for r in (0, 1) for i, a in enumerate(answers[r])}
        cap = V.validate_cap(
            None, None, iter(cap_batches), spec, StubTok(), anno
        )
        # merged over 3 rows on BOTH ranks: 2/3 unigram-exact hypotheses
        assert 0.0 < cap["CIDEr"] and cap["Bleu_1"] > 0.5, cap
    finally:
        V.gen.generate = orig


def check_validate_pt_merge(rank):
    """validate_pt counters must be summed over hosts before dividing so
    both ranks report the dataset-level token accuracies (reference
    test.py:497-531 all_gather_list of the counts)."""
    import numpy as np

    from valor_tpu.core.tasks import parse_task
    from valor_tpu.eval.validate import validate_pt

    spec = parse_task("pt_caption%tv_mlm%tv")
    V = 10

    def onehot(rows):  # [N,L] ids -> [N,L,V] scores
        return np.eye(V, dtype=np.float32)[np.asarray(rows)]

    if rank == 0:
        cap_lab = np.array([[1, 2, -1], [3, -1, -1]])  # 3 masked tokens
        cap_pred = [[1, 9, 0], [3, 0, 0]]  # 2 hits
        mlm_lab = np.array([[7, -1, -1], [8, -1, -1]])  # 2 tokens
        mlm_pred = [[7, 0, 0], [9, 0, 0]]  # 1 hit
    else:
        cap_lab = np.array([[4, 5, -1]])  # 2 tokens
        cap_pred = [[9, 9, 0]]  # 0 hits
        mlm_lab = np.array([[6, -1, -1]])  # 1 token
        mlm_pred = [[6, 0, 0]]  # 1 hit

    def eval_step(params, batch, task):
        return {
            "caption_scores_tv": onehot(cap_pred),
            "txt_labels_caption": cap_lab,
            "mlm_scores_tv": onehot(mlm_pred),
            "txt_labels_mlm": mlm_lab,
        }

    rep = validate_pt(None, None, eval_step, [{}], spec)
    # merged over both ranks: caption 2/5, mlm 2/3 — identical on each
    assert rep["caption_acc_tv"] == 40.0, rep
    assert rep["mlm_acc_tv"] == 66.67, rep


def check_trainer_2host(jax, rank, out_dir):
    """PRODUCTION Trainer under a real 2-process cluster: params built and
    replicated through build_model_and_state on the global 4-device mesh,
    batches shipped through DevicePrefetcher -> shard_batch's multihost
    global-array branch, orbax multihost checkpoint write + the rank-0
    best-copy/cleanup bookkeeping (shared-FS race if done on all hosts),
    and identical loss trajectories on both ranks."""
    import jax.numpy as jnp

    from tests.conftest import tiny_model_config
    from valor_tpu.cli.build import build_model_and_state
    from valor_tpu.core.config import Config, TrainConfig
    from valor_tpu.parallel.mesh import make_mesh
    from valor_tpu.train.checkpoints import ModelSaver
    from valor_tpu.train.trainer import Trainer

    run_dir = os.path.join(out_dir, "train2host")
    mesh = make_mesh(n_data=4, n_model=1)
    mcfg = tiny_model_config(
        fusion_vocab=512, txt_encoder_type="bert_base_uncased", init_clip_head=False
    )
    cfg = Config(
        model=mcfg,
        train=TrainConfig(
            num_train_steps=3, train_inner_steps=1, valid_steps=0,
            save_best=True, learning_rate=1e-3, seed=0,
        ),
    )
    b = _item_batch([0, 1])  # per-host half of the global batch-4
    example = {k: v for k, v in b.items() if k != "ids"}
    model, tx, state = build_model_and_state(cfg, example, mesh=mesh)

    def batches():
        for i in range(3):
            local = _item_batch([2 * i, 2 * i + 1])  # same on both ranks
            yield "ret%tv--fix", {k: v for k, v in local.items() if k != "ids"}

    saver = ModelSaver(run_dir, remove_before_ckpt=True)
    reports = {}

    def validate_fn(params, step):
        # host-independent fake metric exercising the save_best path
        reports[step] = {"fix": {"ravg": float(step)}}
        return reports[step]

    trainer = Trainer(
        cfg, model, tx, state,
        list(batches()), validate_fn=validate_fn, saver=saver, mesh=mesh,
    )
    # list loaders skip the DevicePrefetcher wiring; re-attach it to run
    # the REAL shard_batch put path (Trainer does this for iterators)
    from valor_tpu.data.loader import DevicePrefetcher
    from valor_tpu.parallel.mesh import shard_batch

    trainer.meta_loader = DevicePrefetcher(
        iter(batches()), lambda bb: shard_batch(mesh, bb)
    )
    final = trainer.run()
    loss = float(trainer.meters["ret%tv--fix/total_loss"].val)
    assert np.isfinite(loss)
    # rank 0 owns the best-copy bookkeeping; barrier before FS asserts
    from valor_tpu.parallel.collectives import all_gather_objects

    all_gather_objects("ckpt-barrier")
    ck = os.path.join(run_dir, "ckpt")
    assert os.path.isdir(os.path.join(ck, "step_3")), os.listdir(run_dir)
    assert os.path.isdir(os.path.join(ck, "best_fix")), os.listdir(ck)
    restored = saver.restore(final)
    assert restored is not None and int(restored["micro_step"]) == 3
    with open(os.path.join(out_dir, f"trainer_rank{rank}.json"), "w") as f:
        json.dump({"loss": loss}, f)


def check_dcn_ici_tp(jax, rank, out_dir):
    """DCN x ICI composition (VERDICT round-4 #8): DP over the PROCESS
    boundary (DCN) with Megatron TP over each process's local devices
    (ICI) in one program — the mesh layout the docs promise
    (parallel/mesh.py DCN notes, SURVEY §2.4) but no other check composes.
    2 processes x 2 local devices -> mesh (data=2, model=2) where the
    data axis strides across processes and model stays in-process; the
    REAL VALOR train step runs with live TP shard-shape asserts and the
    loss trajectory is written for cross-rank comparison."""
    import jax.tree_util as jtu

    from tests.conftest import tiny_model_config
    from valor_tpu.cli.build import build_model_and_state
    from valor_tpu.core.config import Config, TrainConfig
    from valor_tpu.parallel.mesh import MODEL_AXIS, make_mesh
    from valor_tpu.train.trainer import Trainer

    mesh = make_mesh(n_data=2, n_model=2)
    # the composition under test, asserted on the live device grid:
    # data rows are process-aligned (crossing data = crossing DCN),
    # model columns stay inside one process (ICI)
    grid = mesh.devices
    assert grid.shape == (2, 2)
    assert grid[0, 0].process_index == grid[0, 1].process_index == 0
    assert grid[1, 0].process_index == grid[1, 1].process_index == 1

    mcfg = tiny_model_config(
        fusion_vocab=512, txt_encoder_type="bert_base_uncased",
        init_clip_head=False, sequence_parallel=True,
    )
    cfg = Config(
        model=mcfg,
        train=TrainConfig(
            num_train_steps=2, train_inner_steps=1, valid_steps=0,
            learning_rate=1e-3, seed=0,
        ),
    )
    b = _item_batch([0, 1])  # per-process rows of the global batch-4
    example = {k: v for k, v in b.items() if k != "ids"}
    model, tx, state = build_model_and_state(cfg, example, mesh=mesh)

    # live TP assert: fusion attention kernels really split over `model`
    # — i.e. over the two devices INSIDE this process
    split = {}
    for path, leaf in jtu.tree_leaves_with_path(state.params):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if "multimodal_encoder" in p and p.endswith("query/kernel"):
            split[p] = (leaf.shape, leaf.sharding)
    assert split, "no fusion attention kernels found"
    for p, (shape, sharding) in split.items():
        assert MODEL_AXIS in str(sharding.spec), f"{p}: {sharding.spec}"
        assert sharding.shard_shape(shape)[-1] * 2 == shape[-1], p
        # every shard of a model-sharded leaf lives on BOTH processes
        # (replicated over data/DCN, split over model/ICI)
        procs = {d.process_index for d in sharding.device_set}
        assert procs == {0, 1}, (p, procs)

    def batches():
        for i in range(2):
            local = _item_batch([2 * i + 10, 2 * i + 11])  # same on both ranks
            yield "ret%tv--fix", {k: v for k, v in local.items() if k != "ids"}

    trainer = Trainer(cfg, model, tx, state, iter(batches()), mesh=mesh)
    from valor_tpu.data.loader import DevicePrefetcher
    from valor_tpu.parallel.mesh import shard_batch

    trainer.meta_loader = DevicePrefetcher(
        iter(batches()), lambda bb: shard_batch(mesh, bb)
    )
    final = trainer.run()
    assert int(final.step) == 2
    loss = float(trainer.meters["ret%tv--fix/total_loss"].val)
    assert np.isfinite(loss)
    with open(os.path.join(out_dir, f"dcn_ici_rank{rank}.json"), "w") as f:
        json.dump({"loss": loss}, f)


def main():
    rank, coord, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    jax.distributed.initialize(coord, num_processes=2, process_id=rank)
    assert jax.process_count() == 2
    assert jax.device_count() == 4
    check_shard_batch(jax, rank)
    check_object_collectives(rank)
    check_gather_empty_shard(rank)
    check_validate_qa_cap_merge(rank)
    check_validate_pt_merge(rank)
    check_validate_ret(jax, rank, out_dir)
    check_trainer_2host(jax, rank, out_dir)
    check_dcn_ici_tp(jax, rank, out_dir)
    print(f"rank {rank}: OK", flush=True)


if __name__ == "__main__":
    main()
