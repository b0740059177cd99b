"""Multi-host dryrun: 2 processes x 4 virtual CPU devices, one global mesh.

Validates the jax.distributed groundwork (parallel/distributed.py) that
replaces the reference's accelerate/DeepSpeed+NCCL multi-node launchers
(trainers/utils.py:546-550, wan/distributed/util.py:6-10): two OS processes
initialize a shared coordinator, build a global dp=2 x fsdp=2 x sp=2 mesh
spanning both, run one flow-match training step of the tiny Wan DiT with the
batch sharded across processes, and the loss must equal the single-process
8-device run bit-for-bit (same global data, same mesh topology).

Also demonstrates process-0-gated checkpoint IO (is_main_process) and the
broadcast_object seed sync (the dist.broadcast_object_list analog).

Usage:
  python tools/dryrun_multihost.py            # parent: spawn + compare
  (child mode is internal, selected via PROCESS_ID env)
"""
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PER_PROC = 4
N_PROC = 2


def _train_once(mesh, distributed: bool, pre_execute_barrier=None):
    """One deterministic tiny train step on an 8-device (dp,fsdp,sp) mesh.

    pre_execute_barrier: called AFTER the step is AOT-compiled and BEFORE it
    executes. Cross-process runs pass a coordination-service barrier here so
    every process enters its first collective near-simultaneously — Gloo's
    context bootstrap only allows 30 s of skew, while concurrent single-core
    compiles can finish minutes apart."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit
    from video_styler_tpu.parallel import ShardingContext, use_sharding
    from video_styler_tpu.parallel.fsdp import param_shardings
    from video_styler_tpu.trainers import make_train_step

    cfg = WanDiTConfig(dim=8 * 48, in_dim=16, ffn_dim=1024, out_dim=16,
                       num_heads=8, num_layers=2, text_dim=64, freq_dim=32)
    params_host = jax.tree_util.tree_map(
        np.asarray, init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
    p_specs = param_shardings(params_host, mesh)

    def put_global(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    params = jax.tree_util.tree_map(put_global, params_host, p_specs)

    optimizer = optax.adamw(1e-4)
    opt_state = jax.jit(optimizer.init)(params)
    rep = NamedSharding(mesh, P())
    opt_state = jax.tree_util.tree_map(
        lambda x: x if len(x.sharding.device_set) == mesh.size
        else put_global(np.asarray(x), rep), opt_state)

    batch = mesh.shape["dp"]
    lat_host = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (batch, 16, 4, 8, 8), jnp.float32))
    ctx_host = np.asarray(jax.random.normal(
        jax.random.PRNGKey(2), (batch, 16, cfg.text_dim), jnp.float32))
    latents = put_global(lat_host, NamedSharding(mesh, P("dp")))
    context = put_global(ctx_host, NamedSharding(mesh, P("dp")))
    rng = jax.random.PRNGKey(3)

    step = make_train_step(cfg, optimizer, remat=True)
    o_specs = jax.tree_util.tree_map(
        lambda x: x.sharding if hasattr(x, "sharding") else rep, opt_state)
    with use_sharding(ShardingContext(mesh)):
        jstep = jax.jit(step,
                        in_shardings=(p_specs, o_specs,
                                      NamedSharding(mesh, P("dp")),
                                      NamedSharding(mesh, P("dp")), rep),
                        out_shardings=(rep, p_specs, o_specs))
        compiled = jstep.lower(params, opt_state, latents, context,
                               rng).compile()
        if pre_execute_barrier is not None:
            pre_execute_barrier()
        loss, params, opt_state = compiled(params, opt_state, latents,
                                           context, rng)
    return float(loss)


def child():
    os.environ.setdefault("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += \
            f" --xla_force_host_platform_device_count={N_PER_PROC}"
    if "--xla_cpu_collective_call_terminate_timeout_seconds" not in \
            os.environ["XLA_FLAGS"]:
        # a loaded single-core host can take minutes to get every partition
        # thread to a collective; don't let XLA's 40 s default abort us
        os.environ["XLA_FLAGS"] += (
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from video_styler_tpu.parallel import distributed as D

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    D.initialize()  # env-driven: COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.device_count() == N_PROC * N_PER_PROC, jax.device_count()

    # seed sync: process 0 decides, everyone agrees (broadcast_object_list
    # analog, video_enhancing_batch.py:347-350). The coordination barrier
    # aligns both processes before their FIRST device collective (Gloo
    # context bootstrap tolerates only 30 s of arrival skew).
    D.coordination_barrier("pre-broadcast")
    seed = D.broadcast_object(
        12345 if D.process_index() == 0 else -1)
    assert int(seed) == 12345, seed

    mesh = D.make_global_mesh(dp=2, fsdp=2, sp=2)
    loss = _train_once(
        mesh, distributed=True,
        pre_execute_barrier=lambda: D.coordination_barrier("pre-train"))

    # process-0-gated checkpoint IO
    ckpt_dir = os.environ["DRYRUN_CKPT_DIR"]
    if D.is_main_process():
        with open(os.path.join(ckpt_dir, "ckpt_from_main.json"), "w") as f:
            json.dump({"loss": loss}, f)
    D.sync_processes("after-ckpt")

    print(json.dumps({"process": D.process_index(), "loss": loss,
                      "devices": jax.device_count()}), flush=True)


def single_process_reference():
    os.environ.setdefault("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += \
            f" --xla_force_host_platform_device_count={N_PROC * N_PER_PROC}"
    if "--xla_cpu_collective_call_terminate_timeout_seconds" not in \
            os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += (
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from video_styler_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(dp=2, fsdp=2, sp=2)
    loss = _train_once(mesh, distributed=False)
    print(json.dumps({"process": "single", "loss": loss}), flush=True)


def parent():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    ckpt_dir = tempfile.mkdtemp(prefix="dryrun_mh_")

    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env.update({
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": str(N_PROC),
            "PROCESS_ID": str(pid),
            "DRYRUN_CKPT_DIR": ckpt_dir,
            "DRYRUN_ROLE": "child",
            "JAX_PLATFORMS": "cpu",
            # override any inherited device-count flag (e.g. from a prior
            # dryrun_multichip in the calling process)
            "XLA_FLAGS":
                f"--xla_force_host_platform_device_count={N_PER_PROC}",
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = {}
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=1500)
        if p.returncode != 0:
            print(err[-3000:], file=sys.stderr)
            raise RuntimeError(f"child {pid} failed rc={p.returncode}")
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results[pid] = json.loads(line)

    env = dict(os.environ)
    env.update({"DRYRUN_ROLE": "single", "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count="
                             f"{N_PROC * N_PER_PROC}"})
    env.pop("COORDINATOR_ADDRESS", None)
    p = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                       capture_output=True, text=True, timeout=1500)
    if p.returncode != 0:
        print(p.stderr[-3000:], file=sys.stderr)
        raise RuntimeError("single-process reference failed")
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    ref = json.loads(line)

    ckpt_written = os.path.exists(
        os.path.join(ckpt_dir, "ckpt_from_main.json"))
    diff = max(abs(results[i]["loss"] - ref["loss"]) for i in range(N_PROC))
    report = {
        "ok": bool(diff < 1e-5 and ckpt_written),
        "loss_multihost": [results[i]["loss"] for i in range(N_PROC)],
        "loss_single_process": ref["loss"],
        "max_loss_diff": diff,
        "main_process_ckpt_written": ckpt_written,
        "mesh": "2 processes x 4 devices -> dp=2 fsdp=2 sp=2",
    }
    print(json.dumps(report, indent=1))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    role = os.environ.get("DRYRUN_ROLE", "parent")
    if role == "child":
        child()
    elif role == "single":
        single_process_reference()
    else:
        sys.exit(parent())
