"""Experiment registry (reference core/experiments.py:397-405).

Every registered experiment keeps the reference's name, config schema and
artifact formats (npy arrays saved as (3, N), json result files, h5
submission zip), with forwards jitted and batched on the TPU:

* ``fixed``            — noise-conditioned completions dumped to ``fixed/``
* ``evaluate_generativity`` — MMD/COV(CD,EMD) + JSD per category
* ``compute_mmd_tmd_uhd``   — consumes ``fixed/``; reports MMD*1000,
                              UHD*100, TMD*100
* ``merge_different_categories`` — cross-category pocket transplants
* ``same_model_different_slices`` — re-sliced gt completions
* ``completion3d_submission``     — benchmark-server submission.zip
* ``temp_exp``          — user extension stub
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil
from dataclasses import dataclass
from functools import partial
from os.path import basename, join
from zipfile import ZipFile

import jax
import jax.numpy as jnp
import numpy as np

from hyperpocket_tpu.data.loader import BatchLoader
from hyperpocket_tpu.data.slicer import slice_point_cloud
from hyperpocket_tpu.models import FullModel

log = logging.getLogger("hyperpocket_tpu.experiments")


@dataclass
class ExperimentContext:
    """Model + restored params + bookkeeping handed to every experiment."""

    model: FullModel
    params: dict
    epoch: int
    seed: int = 2020

    def __post_init__(self):
        self.latent_prior = None  # set by fit_latent_prior (empirical draws)
        # host-side counter folded into keys inside jit: no eager RNG ops in
        # the per-object loops (slow over the device tunnel)
        self._counter = int(self.seed) * 1_000_003
        self._key = jax.random.key(self.seed)
        # seeded host RNG for experiment-level sampling (object choice,
        # re-slicing planes): the reference seeds global RNGs before the
        # mode switch (core/main.py:28 via core/setup.py:12-19); threading an
        # explicit Generator makes artifacts reproducible run-to-run
        self.np_rng = np.random.default_rng(self.seed)

        @partial(jax.jit, static_argnames=("num_points",))
        def _complete(params, existing, noise, seed, epoch, num_points):
            return self.model.apply(
                params, existing, None, jax.random.key(seed), epoch,
                num_output_points=num_points, training=False, noise=noise,
            )

        @partial(jax.jit, static_argnames=("num_points",))
        def _complete_from_missing(params, existing, missing, seed, epoch, num_points):
            return self.model.apply(
                params, existing, missing, jax.random.key(seed), epoch,
                num_output_points=num_points, training=False,
            )

        @partial(jax.jit, static_argnames=("batch",))
        def _noise(seed, mean, std, batch):
            return mean + std * jax.random.normal(
                jax.random.key(seed), (batch, self.model.get_noise_size())
            )

        @partial(jax.jit, static_argnames=("batch",))
        def _noise_prior(seed, prior_mean, prior_tril, batch):
            eps = jax.random.normal(
                jax.random.key(seed), (batch, self.model.get_noise_size())
            )
            return prior_mean + eps @ prior_tril.T

        @partial(jax.jit, static_argnames=("num_points", "block"))
        def _complete_blocks(params, existing, noise_seeds, ball_seeds, mean, std,
                             epoch, num_points, block):
            # G fused (noise-draw + completion) blocks in ONE dispatch. Each
            # block reproduces exactly what a standalone `_noise(ns)` +
            # `_complete(..., bs)` pair would produce (same keys, same
            # per-block shapes under vmap), so fusing G blocks changes the
            # dispatch count, not the values — evaluate_generativity relies
            # on this to match its per-object loop form.
            def one(ex, ns, bs):
                noise = mean + std * jax.random.normal(
                    jax.random.key(ns), (block, self.model.get_noise_size())
                )
                return self.model.apply(
                    params, ex, None, jax.random.key(bs), epoch,
                    num_output_points=num_points, training=False, noise=noise,
                )

            return jax.vmap(one)(existing, noise_seeds, ball_seeds)

        @partial(jax.jit, static_argnames=("num_points", "block"))
        def _complete_blocks_prior(params, existing, noise_seeds, ball_seeds,
                                   prior_mean, prior_tril, epoch, num_points,
                                   block):
            # empirical-prior twin of _complete_blocks: same seed schedule,
            # noise = mean + eps @ L^T instead of the isotropic draw
            def one(ex, ns, bs):
                eps = jax.random.normal(
                    jax.random.key(ns), (block, self.model.get_noise_size())
                )
                noise = prior_mean + eps @ prior_tril.T
                return self.model.apply(
                    params, ex, None, jax.random.key(bs), epoch,
                    num_output_points=num_points, training=False, noise=noise,
                )

            return jax.vmap(one)(existing, noise_seeds, ball_seeds)

        self._complete = _complete
        self._complete_from_missing = _complete_from_missing
        self._noise = _noise
        self._noise_prior = _noise_prior
        self._complete_blocks = _complete_blocks
        self._complete_blocks_prior = _complete_blocks_prior

    def next_key(self):
        self._counter += 1
        return np.uint32(self._counter & 0xFFFFFFFF)

    def complete(self, existing, noise, num_points: int = 2048) -> np.ndarray:
        """existing (B, N, 3) + noise (B, Z) -> completions (B, num_points, 3)."""
        out = self._complete(
            self.params, jnp.asarray(existing), jnp.asarray(noise),
            self.next_key(), jnp.asarray(float(self.epoch)), num_points,
        )
        return np.asarray(out)

    def complete_from_missing(self, existing, missing, num_points: int = 2048) -> np.ndarray:
        out = self._complete_from_missing(
            self.params, jnp.asarray(existing), jnp.asarray(missing),
            self.next_key(), jnp.asarray(float(self.epoch)), num_points,
        )
        return np.asarray(out)

    def sample_noise(self, batch: int, mean: float, std: float,
                     source: str = "normal") -> np.ndarray:
        """Missing-half code draw. ``source="normal"`` is the reference's
        isotropic N(mean, std); ``"empirical"`` samples the fitted latent
        Gaussian (requires ``fit_latent_prior`` — see eval/latent_stats.py
        for why isotropic draws decode poorly on small corpora)."""
        if source == "empirical":
            if self.latent_prior is None:
                raise ValueError(
                    "noise_source='empirical' requires ctx.fit_latent_prior() "
                    "(or experiments.latent_prior in the config) first"
                )
            return np.asarray(self._noise_prior(
                self.next_key(), jnp.asarray(self.latent_prior.mean),
                jnp.asarray(self.latent_prior.scale_tril), batch,
            ))
        if source != "normal":
            raise ValueError(f"unknown noise source {source!r}")
        return np.asarray(self._noise(self.next_key(), float(mean), float(std), batch))

    def fit_latent_prior(self, missing_clouds, batch_size: int = 64) -> None:
        """Fit the empirical latent Gaussian over (N, M, 3) missing halves."""
        from hyperpocket_tpu.eval.latent_stats import fit_latent_gaussian

        self.latent_prior = fit_latent_gaussian(
            self.model, self.params, missing_clouds, batch_size
        )


# ---------------------------------------------------------------------------


def fixed(ctx: ExperimentContext, datasets_dict, results_dir: str, epoch, amount=30,
          mean=0.0, std=0.015, noises_per_item=10, batch_size=8, save_plots=False,
          triangulation_config=None, num_points=2048, noise_source="normal"):
    """Reference core/experiments.py:23-60. Artifacts are (3, N) npy files.

    ``num_points`` defaults to the reference's hardcoded 2048-point output
    (experiments.py:42). ``triangulation_config`` AND ``amount`` are
    accepted-but-ignored, as in the reference (experiments.py:23-25 — its
    loop covers the whole dataset regardless of ``amount``;
    utils/sphere_triangles.py is dead code there).
    """
    out_dir = join(results_dir, "fixed")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    for cat_name, ds in datasets_dict.items():
        loader = BatchLoader(ds, batch_size, shuffle=False, num_workers=4)
        for i, (existing, _, _, _) in enumerate(loader.epoch(0)):
            for j in range(noises_per_item):
                noise = ctx.sample_noise(existing.shape[0], mean, std,
                                         source=noise_source)
                rec = ctx.complete(existing, noise, num_points=num_points)  # (B, P, 3)
                for k in range(rec.shape[0]):
                    np.save(join(out_dir, f"{cat_name}_{i * batch_size + k}_{j}_reconstruction"),
                            rec[k].T)
                    if save_plots:
                        from hyperpocket_tpu.utils.plotting import plot_3d_point_cloud

                        fig = plot_3d_point_cloud(rec[k, :, 0], rec[k, :, 1], rec[k, :, 2],
                                                  in_u_sphere=True, show=False)
                        fig.savefig(join(out_dir, f"{cat_name}_{i * batch_size + k}_{j}_fixed_reconstructed.png"))
                        import matplotlib.pyplot as plt

                        plt.close(fig)
            for k in range(existing.shape[0]):
                np.save(join(out_dir, f"{cat_name}_{i * batch_size + k}_existing"), existing[k].T)
                if save_plots:
                    from hyperpocket_tpu.utils.plotting import plot_3d_point_cloud

                    fig = plot_3d_point_cloud(existing[k, :, 0], existing[k, :, 1],
                                              existing[k, :, 2], in_u_sphere=True, show=False)
                    fig.savefig(join(out_dir, f"{cat_name}_{i * batch_size + k}_existing.png"))
                    import matplotlib.pyplot as plt

                    plt.close(fig)


def _generate_completion_sets(ctx: ExperimentContext, existing_objs, n_gen: int,
                              batch_size: int, mean: float, std: float,
                              dispatch_clouds: int = 512,
                              num_points: int = 2048,
                              noise_source: str = "normal") -> np.ndarray:
    """n_gen completions per object -> (n_obj, n_gen, num_points, 3).

    Dispatch-batched but VALUE-identical to the per-object loop form the
    reference uses (core/experiments.py:81-93): the (object, block) schedule
    consumes ctx counter seeds in exactly the loop's order — one noise draw
    and one completion key per block of ``batch_size`` — and G blocks of
    equal size are fused into one ``_complete_blocks`` dispatch (vmap over
    per-block keys reproduces the standalone per-block draws bit-for-bit).
    """
    n_obj = len(existing_objs)
    schedule = []  # (obj, start, block_size, noise_seed, ball_seed) — loop order
    for o in range(n_obj):
        for start in range(0, n_gen, batch_size):
            b = min(batch_size, n_gen - start)
            schedule.append((o, start, b, ctx.next_key(), ctx.next_key()))
    out = np.empty((n_obj, n_gen, num_points, 3), np.float32)
    for block in sorted({e[2] for e in schedule}):
        entries = [e for e in schedule if e[2] == block]
        group = max(1, dispatch_clouds // block)
        for g0 in range(0, len(entries), group):
            chunk = entries[g0 : g0 + group]
            n_real = len(chunk)
            if n_real < group:
                # pad with the last entry so ONE (group, block, ...) shape is
                # ever compiled (fresh shapes pay erratic multi-10s Mosaic
                # compiles over the tunnel); pad outputs are discarded.
                chunk = chunk + [chunk[-1]] * (group - n_real)
            ex = np.stack([
                np.broadcast_to(existing_objs[o], (block,) + existing_objs[o].shape)
                for o, *_ in chunk
            ])
            noise_seeds = np.asarray([e[3] for e in chunk], np.uint32)
            ball_seeds = np.asarray([e[4] for e in chunk], np.uint32)
            if noise_source == "empirical":
                if ctx.latent_prior is None:
                    raise ValueError(
                        "noise_source='empirical' requires ctx.fit_latent_prior()"
                    )
                rec = np.asarray(ctx._complete_blocks_prior(
                    ctx.params, jnp.asarray(ex), noise_seeds, ball_seeds,
                    jnp.asarray(ctx.latent_prior.mean),
                    jnp.asarray(ctx.latent_prior.scale_tril),
                    jnp.asarray(float(ctx.epoch)), num_points, block,
                ))
            else:
                rec = np.asarray(ctx._complete_blocks(
                    ctx.params, jnp.asarray(ex), noise_seeds, ball_seeds,
                    float(mean), float(std), jnp.asarray(float(ctx.epoch)),
                    num_points, block,
                ))
            for (o, start, b, _, _), r in zip(chunk[:n_real], rec[:n_real]):
                out[o, start : start + b] = r
    return out


def _lowest_y_1024(recs: np.ndarray) -> np.ndarray:
    """Keep the 1024 lowest-y points of each cloud (experiments.py:92)."""
    order = np.argsort(recs[..., 1], axis=-1)[..., :1024]
    return np.take_along_axis(recs, order[..., None], axis=-2)


def evaluate_generativity(ctx: ExperimentContext, datasets_dict, results_dir: str, epoch,
                          batch_size=25, num_workers=8, mean=0.0, std=0.005,
                          dispatch_clouds=512, object_group_clouds=8192,
                          noise_source="normal", include_1nna=False,
                          parallel_data=None):
    """Reference core/experiments.py:63-104: per-object MMD/COV + JSD vs the
    category's missing-part population (per-object metric SUMS — the
    reference's quirk, preserved).

    Restructured for scale (VERDICT r3 #3): completions for whole object
    groups are generated in fused dispatches (``_generate_completion_sets``),
    the per-object pairwise CD/EMD matrices come from ONE flat-pair-batched
    dispatch stream per group (``pairwise_emd_cd_multi`` — the reference
    dispatches one CUDA launch per (row, chunk) per object), the mmd_cov
    reductions run as one batched dispatch per group, and the category's
    reference occupancy grid for JSD is computed once instead of per object.
    ``object_group_clouds`` bounds host memory (group = clouds held at
    once); per-object values match the reference's loop exactly.

    ``include_1nna`` (off by default for parity): also report the 1-NN
    two-sample accuracy keys the reference computes but comments out of
    compute_all_metrics (utils/metrics.py:224-237) — summed per object like
    every other key, with the reference's "1-NN-{CD,EMD}-{acc*}" naming.

    ``num_workers`` is accepted for config-schema parity (the reference
    feeds it to a DataLoader, core/experiments.py:69) but unused: the
    batched pipeline has no loader and sizes its own dispatches via
    ``dispatch_clouds``/``object_group_clouds``.

    ``parallel_data`` (config key in this experiment's settings): shard the
    pairwise CD/EMD matrix builds — the experiment's wall-clock wall at real
    3D-EPN scale — over an N-device data mesh (``pairwise_emd_cd_multi``'s
    ``mesh``). The reference fanned this out with Ray across GPUs
    (utils/evaluation/completeness.py:53-88); here the same fan-out is a
    shard_map over the mesh's data axis. Per-pair values are unchanged.
    """
    from hyperpocket_tpu.eval.metrics import (
        entropy_of_occupancy_grid,
        jsd_between_point_cloud_sets,
        knn_batch_1nna,
        mmd_cov_multi,
        pairwise_emd_cd,
        pairwise_emd_cd_multi,
    )

    os.makedirs(join(results_dir, "evaluate_generativity"), exist_ok=True)
    mesh = None
    if parallel_data and int(parallel_data) > 1:
        from hyperpocket_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(int(parallel_data), 1)
    results: dict[str, dict] = {}
    for cat_name, ds in datasets_dict.items():
        if len(ds) == 0:
            raise ValueError(
                f"evaluate_generativity got an empty dataset for category "
                f"{cat_name!r} (split matched no on-disk models?)"
            )
        # materialize each item ONCE (an uncached __getitem__ loads 3 PLY
        # files; reading [1] and [0] in separate passes doubled the IO)
        items = [ds[i] for i in range(len(ds))]
        if np.ndim(items[0][1]) != 2:
            # 3D-EPN/Completion3D TEST items carry a scalar missing-part
            # placeholder (reference datasets/shapenet_3depn.py:134); the
            # reference only ever enables this experiment on datasets whose
            # items have real missing halves (its 3depn sample configs ship
            # execute=false) — fail actionably instead of inside cKDTree
            raise ValueError(
                f"evaluate_generativity needs items with a real missing-part "
                f"cloud at index 1; category {cat_name!r} has a scalar "
                "placeholder. For 3D-EPN that is the test split (val has "
                "real missing halves); Completion3D has the placeholder on "
                "every split, so disable this experiment there, as the "
                "reference configs do"
            )
        cat_gt = np.stack([np.asarray(it[1], dtype=np.float32) for it in items])
        n_gen = len(cat_gt)
        existing_objs = [np.asarray(it[0], dtype=np.float32) for it in items]
        del items
        ref_grid = entropy_of_occupancy_grid(cat_gt, 28, True)[1]
        cat_results: dict[str, float] = {}
        group = max(1, object_group_clouds // max(n_gen, 1))
        if include_1nna:
            # ref-ref matrix is object-independent: once per category. Under
            # a mesh it is the same O(n_gen^2) pair work the mesh shards —
            # route it through the flat-pair path (per-pair values identical)
            if mesh is not None:
                rr = pairwise_emd_cd_multi(cat_gt, cat_gt[None], dispatch_clouds,
                                           mesh=mesh)
                m_rr_cd, m_rr_emd = rr[0][0], rr[1][0]
            else:
                m_rr_cd, m_rr_emd = pairwise_emd_cd(cat_gt, cat_gt, batch_size)
        for o0 in range(0, len(ds), group):
            objs = existing_objs[o0 : o0 + group]
            recs = _generate_completion_sets(
                ctx, objs, n_gen, batch_size, mean, std, dispatch_clouds,
                noise_source=noise_source,
            )
            recs = _lowest_y_1024(recs)
            m_rs_cd, m_rs_emd = pairwise_emd_cd_multi(cat_gt, recs, dispatch_clouds,
                                                      mesh=mesh)
            per_object = mmd_cov_multi(m_rs_cd, m_rs_emd)
            if include_1nna:
                m_ss_cd, m_ss_emd = pairwise_emd_cd_multi(recs, recs, dispatch_clouds,
                                                          mesh=mesh)
                for tag, m_rr, m_rs, m_ss in (("CD", m_rr_cd, m_rs_cd, m_ss_cd),
                                              ("EMD", m_rr_emd, m_rs_emd, m_ss_emd)):
                    res = jax.device_get(knn_batch_1nna(
                        jnp.asarray(m_rr), jnp.asarray(m_rs), jnp.asarray(m_ss)))
                    for k, v in res.items():
                        if "acc" in k:
                            for g, obj_res in enumerate(per_object):
                                obj_res[f"1-NN-{tag}-{k}"] = float(v[g])
            for obj_recs, obj_res in zip(recs, per_object):
                for k, v in obj_res.items():
                    cat_results[k] = cat_results.get(k, 0.0) + float(v)
                cat_results["jsd"] = cat_results.get("jsd", 0.0) + jsd_between_point_cloud_sets(
                    obj_recs, ref_grid=ref_grid
                )
        results[cat_name] = cat_results
        log.info("%s %s", cat_name, cat_results)

    with open(join(results_dir, "evaluate_generativity", f"{epoch}eval_gen_by_cat.json"), "w") as fh:
        json.dump(results, fh)
    return results


def compute_mmd_tmd_uhd(ctx: ExperimentContext, datasets_dict, results_dir: str, epoch,
                        batch_size=64):
    """Reference core/experiments.py:107-128; consumes the fixed/ directory."""
    from hyperpocket_tpu.eval.evaluation import mmd_process, tmd_process, uhd_process

    os.makedirs(join(results_dir, "compute_mmd_tmd_uhd"), exist_ok=True)
    shape_dir = join(results_dir, "fixed")
    if not glob.glob(join(shape_dir, "*reconstruction.npy")):
        # run_experiments executes in config-settings order (reference
        # core/main.py:184); a config listing this experiment before "fixed"
        # would otherwise die deep in np.stack with an opaque error
        raise FileNotFoundError(
            f"compute_mmd_tmd_uhd found no *reconstruction.npy under {shape_dir}; "
            "the 'fixed' experiment must run first (list it before "
            "compute_mmd_tmd_uhd in experiments.settings)"
        )
    if isinstance(datasets_dict, dict):
        if len(datasets_dict) != 1:
            # fixed/ mixes categories into one directory while mmd_process
            # stacks a single dataset's gt — multi-category would silently
            # compare mismatched sets (the reference is per-class too)
            raise ValueError(
                "compute_mmd_tmd_uhd requires a single-category test set; got "
                f"{sorted(datasets_dict)} — use a per-class config"
            )
        dataset = next(iter(datasets_dict.values()))
    else:
        dataset = datasets_dict
    res = {}
    mmd_v = mmd_process(shape_dir, dataset, batch_size)
    log.info("MMD * 1000 = %s", mmd_v * 1000)
    res["MMD * 1000"] = mmd_v * 1000
    uhd_v = uhd_process(shape_dir)
    log.info("UHD * 100 = %s", uhd_v * 100)
    res["UHD * 100"] = uhd_v * 100
    tmd_v = tmd_process(shape_dir)
    log.info("TMD * 100 = %s", tmd_v * 100)
    res["TMD * 100"] = tmd_v * 100
    with open(join(results_dir, "compute_mmd_tmd_uhd", f"{epoch}res.json"), "w") as fh:
        json.dump(res, fh)
    return res


def merge_different_categories(ctx: ExperimentContext, datasets_dict, results_dir: str, epoch,
                               amount=10, first_cat="car", second_cat="airplane",
                               split_points=1024):
    """Reference core/experiments.py:131-191: cross-category pocket transplants.

    Two reference bugs are deliberately fixed here (see PARITY.md):
    ``second_cat_ids`` are drawn from the *second* dataset's length (the
    reference indexes the second dataset with ids drawn from
    ``len(first_cat_dataset)``, experiments.py:140), and the second~second
    reconstruction uses the second category's missing half (the reference
    reuses ``temp_f_missing``, experiments.py:190).
    """
    out_dir = join(results_dir, "merge_different_categories")
    os.makedirs(out_dir, exist_ok=True)
    first_ds, second_ds = datasets_dict[first_cat], datasets_dict[second_cat]
    if len(first_ds) < amount or len(second_ds) < amount:
        raise ValueError(
            f"with current dataset config the max amount value is "
            f"{min(len(first_ds), len(second_ds))}"
        )
    first_ids = ctx.np_rng.choice(len(first_ds), amount, replace=False)
    second_ids = ctx.np_rng.choice(len(second_ds), amount, replace=False)

    def halves(gt):
        # x-sorted split at split_points (the reference hardcodes 1024 =
        # half of its 2048-pt gt, experiments.py:149-153)
        order = np.argsort(gt.T[0])
        return gt[order[split_points:]], gt[order[:split_points]]  # (existing, missing)

    for i in range(amount):
        f_gt = np.asarray(first_ds[first_ids[i]][2], dtype=np.float32)
        s_gt = np.asarray(second_ds[second_ids[i]][2], dtype=np.float32)
        f_existing, f_missing = halves(f_gt)
        s_existing, s_missing = halves(s_gt)
        for tag, arrs in ((first_cat, (f_existing, f_missing, f_gt)),
                          (second_cat, (s_existing, s_missing, s_gt))):
            for name, arr in zip(("existing", "missing", "gt"), arrs):
                np.save(join(out_dir, f"{tag}_{i}_{name}"), arr)

        for j in range(amount):
            t_f_missing = halves(np.asarray(first_ds[first_ids[j]][2], dtype=np.float32))[1]
            t_s_missing = halves(np.asarray(second_ds[second_ids[j]][2], dtype=np.float32))[1]
            # each completion is generated at ITS existing object's gt size
            # (the reference's fixed 2048 decode makes this invisible there;
            # matters only for mixed-resolution corpora). Artifacts are kept
            # in the reference merge layout — (N, 3), unlike fixed's (3, N):
            # the reference itself differs per experiment
            # (experiments.py:154-191 raw vs :45 transposed).
            pairs = (
                (f"{first_cat}_{i}~{first_cat}_{j}_rec", f_existing, t_f_missing, f_gt),
                (f"{first_cat}_{i}~{second_cat}_{j}_rec", f_existing, t_s_missing, f_gt),
                (f"{second_cat}_{i}~{first_cat}_{j}_rec", s_existing, t_f_missing, s_gt),
                (f"{second_cat}_{i}~{second_cat}_{j}_rec", s_existing, t_s_missing, s_gt),
            )
            for name, ex, mi, gt in pairs:
                rec = ctx.complete_from_missing(ex[None], mi[None], num_points=gt.shape[0])
                np.save(join(out_dir, name), rec[0])


def same_model_different_slices(ctx: ExperimentContext, datasets_dict, results_dir: str, epoch,
                                amount=10, slices_number=10, mean=0.0, std=0.015,
                                slice_points=1024):
    """Reference core/experiments.py:194-225: complete both halves of random re-slices."""
    out_dir = join(results_dir, "same_model_different_slices")
    os.makedirs(out_dir, exist_ok=True)

    def process_half(pcd, cat_name, tag, i, j):
        np.save(join(out_dir, f"{cat_name}_{i}_{j}_{tag}_pcd"), pcd)
        noise = ctx.sample_noise(1, mean, std)
        np.save(join(out_dir, f"{cat_name}_{i}_{j}_{tag}_noise"), noise)
        rec = ctx.complete(pcd[None].astype(np.float32), noise)[0]
        np.save(join(out_dir, f"{cat_name}_{i}_{j}_{tag}_rec"), rec.T)

    for cat_name, ds in datasets_dict.items():
        ids = ctx.np_rng.choice(len(ds), min(amount, len(ds)), replace=False)
        for i, idx in enumerate(ids):
            gt = np.asarray(ds[idx][2], dtype=np.float32)
            np.save(join(out_dir, f"{cat_name}_{i}_gt"), gt)
            for j in range(slices_number):
                first, second = slice_point_cloud(gt, slice_points, rng=ctx.np_rng)
                process_half(first, cat_name, "f", i, j)
                process_half(second, cat_name, "s", i, j)


def completion3d_submission(ctx: ExperimentContext, datasets_dict, results_dir: str, epoch,
                            batch_size=1):
    """Reference core/experiments.py:228-247: per-model h5 + submission.zip."""
    import h5py

    bench_dir = join(results_dir, "completion3d_submission")
    shutil.rmtree(bench_dir, ignore_errors=True)
    os.makedirs(bench_dir, exist_ok=True)
    loader = BatchLoader(datasets_dict["all"], batch_size, shuffle=False, num_workers=4)
    with ZipFile(join(results_dir, "submission.zip"), "w") as zf:
        for existing, _, _, model_ids in loader.epoch(0):
            noise = ctx.sample_noise(existing.shape[0], 0.0, 0.0)
            rec = ctx.complete(existing, noise)  # (B, 2048, 3)
            for idx in range(rec.shape[0]):
                ofile = join(bench_dir, str(model_ids[idx]).split("/")[-1] + ".h5")
                with h5py.File(ofile, "w") as fh:
                    fh.create_dataset("data", data=rec[idx])
                zf.write(ofile, "all/" + basename(ofile))


def make_tsne_reduction(ctx: ExperimentContext, datasets_dict, results_dir: str, epoch,
                        cat_name: str | None = None, amount: int = 100):
    """t-SNE of latents and target-network weights over a category.

    Cleaned-up, working version of the reference's unregistered
    ``make_tsne_reduction`` (core/experiments.py:250-389): for each of
    ``amount`` random gt clouds, encode two different axis-sorted slicings
    (x-split and y-split), embed the latents and the flat target-network
    weights with t-SNE, save both embeddings and the per-object distance
    between the two slicings' embeddings. Like the reference, it is NOT in
    the default registry; register via ``experiment_functions_dict`` or call
    from ``temp_exp``.
    """
    from sklearn import manifold

    out_dir = join(results_dir, "temp_exp")
    os.makedirs(out_dir, exist_ok=True)
    cats = [cat_name] if cat_name else list(datasets_dict)
    for cat in cats:
        ds = datasets_dict[cat]
        ids = ctx.np_rng.choice(len(ds), min(amount, len(ds)), replace=False)
        latents, tnws = [], []
        for i, idx in enumerate(ids):
            gt = np.asarray(ds[idx][2], dtype=np.float32)
            half = gt.shape[0] // 2
            for axis in (0, 1):  # x-split then y-split (experiments.py:315-321)
                order = np.argsort(gt.T[axis])
                existing, missing = gt[order[half:]], gt[order[:half]]
                latent, tnw = ctx.model.encode(
                    ctx.params, jnp.asarray(existing)[None], jnp.asarray(missing)[None],
                    jax.random.key(ctx.next_key()), training=False,
                )
                latents.append(np.asarray(latent)[0])
                tnws.append(np.asarray(tnw)[0])
        latents, tnws = np.stack(latents), np.stack(tnws)
        perplexity = max(1.0, min(30.0, (len(latents) - 1) / 3))
        latent_tsne = manifold.TSNE(n_components=2, init="pca",
                                    perplexity=perplexity).fit_transform(latents)
        tnw_tsne = manifold.TSNE(n_components=2, init="pca",
                                 perplexity=perplexity).fit_transform(tnws)
        np.save(join(out_dir, f"{cat}_latent_tsne"), latent_tsne)
        np.save(join(out_dir, f"{cat}_tnw_tsne"), tnw_tsne)
        # distance between the two slicings of the same object in embedding space
        latent_dist = np.linalg.norm(latent_tsne[0::2] - latent_tsne[1::2], axis=1)
        tnw_dist = np.linalg.norm(tnw_tsne[0::2] - tnw_tsne[1::2], axis=1)
        np.save(join(out_dir, f"{cat}_latent_dist"), latent_dist)
        np.save(join(out_dir, f"{cat}_tnw_dist"), tnw_dist)


def temp_exp(ctx: ExperimentContext, datasets_dict, results_dir: str, epoch):
    """User extension stub (reference core/experiments.py:392-394)."""


experiment_functions_dict = {
    "fixed": fixed,
    "evaluate_generativity": evaluate_generativity,
    "compute_mmd_tmd_uhd": compute_mmd_tmd_uhd,
    "merge_different_categories": merge_different_categories,
    "same_model_different_slices": same_model_different_slices,
    "completion3d_submission": completion3d_submission,
    "temp_exp": temp_exp,
}


# ---------------------------------------------------------------------------


def run_experiments(config: dict, result_dir: str, datasets=None) -> None:
    """Experiments-mode driver (reference core/main.py:176-188)."""
    from hyperpocket_tpu.data import get_datasets
    from hyperpocket_tpu.train.checkpoint import restore_trained_model
    from hyperpocket_tpu.utils.logging_setup import seed_setup

    # seed python/numpy global RNGs before any experiment runs, mirroring the
    # reference's seed_setup before the mode switch (core/main.py:28)
    seed_setup(config["setup"]["seed"])

    model, params, epoch = restore_trained_model(config)
    log.info("restored epoch %d for experiments", epoch)

    if datasets is None:
        _, _, test_dataset_dict = get_datasets(config["dataset"])
    else:
        test_dataset_dict = datasets

    ctx = ExperimentContext(model, params, epoch, seed=config["setup"]["seed"])

    prior_cfg = config["experiments"].get("latent_prior")
    if prior_cfg:
        # framework extension (documented in eval/latent_stats.py): fit the
        # empirical latent Gaussian on VAL missing halves so experiments may
        # request noise_source="empirical"
        from hyperpocket_tpu.eval.latent_stats import collect_val_missing_halves

        _, val_dict, _ = get_datasets(config["dataset"])
        halves = collect_val_missing_halves(
            val_dict, int(prior_cfg.get("max_items", 1024)))
        ctx.fit_latent_prior(halves, int(prior_cfg.get("batch_size", 64)))
        log.info("fitted empirical latent prior on %d missing halves", len(halves))

    for name, ex_cfg in config["experiments"]["settings"].items():
        ex_cfg = dict(ex_cfg)
        if ex_cfg.pop("execute", False):
            log.info("experiment: %s", name)
            os.makedirs(join(result_dir, name), exist_ok=True)
            experiment_functions_dict[name](ctx, test_dataset_dict, result_dir, epoch, **ex_cfg)
