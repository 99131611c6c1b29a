"""Expert-data collection + PlannerNet training, end to end.

The equivalent of the reference's data-collection session (README.md:151-166:
hours of a single Gazebo instance flying random missions with RecordPlanner)
plus nn_trainer.py's main — collapsed into one command with batched on-device
rollouts. Datagen is chunked (a few segments per device pull) so arbitrarily
large cameras/datasets fit in HBM and host RAM (images stored uint8).

  # fast smallconv net at 160x120
  python examples/train.py --out artifacts/planner_net_smallconv

  # the reference's exact 640x480 ResNet-18 contract
  python examples/train.py --resnet640 --envs 256 --out artifacts/planner_net_resnet640

  # also export a reference-format CSV+PNG dataset
  python examples/train.py --export-csv training_data/
"""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--pulls", type=int, default=6,
                    help="datagen device pulls (segments-per-pull each)")
    ap.add_argument("--segments-per-pull", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--resnet640", action="store_true",
                    help="train the 640x480 ResNet-18 parity contract")
    ap.add_argument("--out", default="artifacts/planner_net")
    ap.add_argument("--export-csv", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from neoplanner_tpu.config import (CameraParams, MapParams, MissionParams,
                                       NetParams, PlannerParams, SimParams,
                                       WorldParams)
    from neoplanner_tpu.learn import datagen, train
    from neoplanner_tpu.models import planner_net
    from neoplanner_tpu.sim import env
    from neoplanner_tpu.world import scenegen

    pp = PlannerParams(max_iters=48)
    mp, sp = MissionParams(), SimParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    wp = WorldParams(num_boxes=12)
    if args.resnet640:
        cam = CameraParams(width=640, height=480)
        netp = NetParams()  # resnet18 @ 640x480, the reference contract
    else:
        cam = CameraParams(width=160, height=120)
        netp = NetParams(img_width=160, img_height=120, backbone="smallconv")

    # ---- chunked datagen
    B = args.envs
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, wp)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.jit(jax.vmap(
        lambda k, w: env.reset(k, w, None, pp, mp, mapp)))(keys, worlds)
    roll = jax.jit(jax.vmap(lambda s: datagen.record_rollout(
        s, args.segments_per_pull, pp, mp, sp, cam, mp.des_pos_z)))
    D, M, L = [], [], []
    t0 = time.time()
    for p in range(args.pulls):
        states, d, m, l, v = roll(states)
        v = np.asarray(v).reshape(-1)
        D.append(np.asarray(d).reshape(-1, cam.height, cam.width)[v]
                 .astype(np.uint8))
        M.append(np.asarray(m).reshape(-1, 24)[v])
        L.append(np.asarray(l).reshape(-1, 9)[v])
        print(f"pull {p}: {sum(len(x) for x in D)} samples "
              f"({time.time() - t0:.0f}s)", flush=True)
    D, M, L = np.concatenate(D), np.concatenate(M), np.concatenate(L)

    if args.export_csv:
        datagen.export_csv(args.export_csv, D, M, L)
        print(f"exported reference-format dataset to {args.export_csv}")

    # ---- train (host-fed batches: images stay uint8 on host)
    model = planner_net.create(netp)
    variables = train.init_params(jax.random.PRNGKey(42), netp)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, img, mot, lab):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, img, mot,
                train=True, mutable=["batch_stats"])
            return jnp.mean((out - lab) ** 2), upd["batch_stats"]
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, img, mot, lab):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          img, mot, train=False)
        return jnp.mean((out - lab) ** 2)

    n = len(D)
    n_tr = int(0.9 * n)
    rng = np.random.default_rng(0)
    split = rng.permutation(n)
    tr, te = split[:n_tr], split[n_tr:]
    BS = args.batch_size
    t0 = time.time()
    for epoch in range(args.epochs):
        order = rng.permutation(n_tr)
        losses = []
        for i in range(0, n_tr - BS + 1, BS):
            idx = tr[order[i:i + BS]]
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(D[idx], dtype=jnp.float32)[..., None],
                jnp.asarray(M[idx]), jnp.asarray(L[idx]))
            losses.append(float(loss))
        print(f"epoch {epoch + 1}: train {np.mean(losses):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    test = [float(eval_step(params, batch_stats,
                            jnp.asarray(D[te[i:i + BS]],
                                        dtype=jnp.float32)[..., None],
                            jnp.asarray(M[te[i:i + BS]]),
                            jnp.asarray(L[te[i:i + BS]])))
            for i in range(0, len(te) - BS + 1, BS)]
    if test:
        print(f"test MSE: {np.mean(test):.4f}")
    train.save_checkpoint(args.out, {"params": params,
                                     "batch_stats": batch_stats}, netp)
    print(f"checkpoint saved to {args.out}")


if __name__ == "__main__":
    main()
