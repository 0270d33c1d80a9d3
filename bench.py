#!/usr/bin/env python
"""Benchmark: full-scene nDSM inference throughput on one chip (flagship model).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.json north star of 10 tiles/sec/chip for 512m x 512m
tiles (512^2 px output, 16k-point bucket) — vs_baseline = value / 10.
"""

from __future__ import annotations

import argparse
import json
import shutil
import time

import numpy as np


def e2e_bench(batch: int = 4, dtype: str = "float32", iters: int = 3,
              sorted_path: bool = False, big: bool = False,
              fused: bool | str = False, device_blend: bool = False,
              image: bool = False, fused_head: bool = False,
              fused_convs: bool = False, wire_u16: bool = False,
              wire_u8img: bool = False, device_img: bool = False,
              blend_scan: bool = False) -> dict:
    """End-to-end serving benchmark: loader -> device forwards -> f64 host
    blend -> GeoTIFF write over the synthetic city (VERDICT r01 item 5;
    reference hot path generator.py:130-159). Returns the MEDIAN iteration's
    phase breakdown (ADVICE r02: best-of overstates steady state) with the
    best attached for reference. ``big`` benches a 12-chunk 3840x1280 m city
    (~10x the patches) so per-call constants amortize like a real scene.
    """
    import os
    import sys

    from tomosar2height_tpu.utils import enable_compile_cache

    enable_compile_cache()
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    import jax

    import make_synthetic_city as msc

    from tomosar2height_tpu.config import compose
    from tomosar2height_tpu.config.compose import default_conf_dir
    from tomosar2height_tpu.data import PatchLoader, TomoSARDataset, build_dataset
    from tomosar2height_tpu.infer import DSMGenerator
    from tomosar2height_tpu.models import build_model

    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.join(here, ".bench", "city_big" if big else "city")
    if big:
        width, height = 3840, 1280
        cx = [float(v) for v in range(0, width + 1, 640)]
        cy = [5000000.0 + v for v in range(0, height + 1, 640)]
        n_chunks = (len(cx) - 1) * (len(cy) - 1)
        grid_overrides = [
            f"chunk.chunk_x={cx}".replace(" ", ""),
            f"chunk.chunk_y={cy}".replace(" ", ""),
            f"dataset.vis_chunks={list(range(n_chunks))}".replace(" ", ""),
        ]
    else:
        width = height = None
        grid_overrides = ["dataset.vis_chunks=[0,1]"]
    overrides = [
        "dataset=synthetic",
        f"dataset.path={root}/generated",
        f"gt_dsm={root}/raster/ndsm.tif",
        f"input_pointcloud_folder={root}/cloud",
        f"output.output_folder={root}/generated",
        f"mask_files.building={root}/raster/footprint.tif",
        f"dataset.mask_files.building={root}/raster/footprint.tif",
        f"dataset.mask_files.type={root}/raster/building_class.tif",
        f"dataset.satellite_image.folder={root}/raster",
        "use_cloud=true", f"use_image={'true' if image else 'false'}",
        "use_footprint=false",
        # flagship shapes: 16k bucket, full z range
        "dataset.points.train_bucket=16384",
        "dataset.points.bucket_sizes=[16384]",
        *grid_overrides,
        f"training.val_batch_size={batch}",
        f"model.dtype={dtype}",
    ]
    if wire_u8img:
        # ship raw u8 image crops, normalize on device (4x less upload)
        overrides.append("dataset.satellite_image.wire=uint8")
    if device_img:
        # resident scene image: upload once, crop per tile ON DEVICE — each
        # tile ships a (row0, col0) origin instead of a 0.8-3 MB crop
        overrides.append("dataset.satellite_image.crop=device")
    if fused_head:
        overrides.append("model.decoder_pixel_kwargs.fused_head=true")
    if fused_convs:
        overrides.append("model.encoder_kwargs.unet_kwargs.fused_convs=true")
        if image:
            overrides.append("model.encoder2_kwargs.fused_convs=true")
    # ~0.06 pts/m^2 fills the 16k bucket on a 512 m patch without overflow
    kw = dict(width=width, height=height) if big else {}
    # The stamp must cover EVERYTHING that shapes generated/: city-generation
    # params (resolved width/height, incl. the implicit defaults in the
    # non-big case) AND the dataset-build config (chunk grid) — a config
    # change must not silently reuse a stale dataset (ADVICE r04).
    build_params = {"seed": 0, "density": 0.055,
                    "width": width or msc.W, "height": height or msc.H,
                    "grid": grid_overrides}
    stamp_path = os.path.join(root, "city_params.json")
    stamp = None
    if os.path.exists(stamp_path):
        # an unreadable/corrupt stamp (e.g. a run killed mid-write) is STALE,
        # not fatal — fall through to the rebuild path (ADVICE r04)
        try:
            with open(stamp_path) as f:
                stamp = json.load(f)
        except (json.JSONDecodeError, OSError):
            stamp = None
    if (stamp != build_params
            or not os.path.exists(os.path.join(root, "generated",
                                               "chunk_info.yaml"))):
        # Missing or stale cache (e.g. another script regenerated the city
        # with different params — a 0.6 pts/m^2 city silently overflows the
        # 16k bucket and invalidates every number measured on it).
        if os.path.isdir(root):
            shutil.rmtree(root)
        msc.main(root, seed=0, density=0.055, **kw)
        cfg = compose(default_conf_dir(), overrides=overrides)
        build_dataset(cfg, overwrite=True)
        with open(stamp_path, "w") as f:
            json.dump(build_params, f)
    cfg = compose(default_conf_dir(), overrides=overrides)

    dataset = TomoSARDataset("vis", cfg["dataset"], random_sample=False,
                             load_target=False, load_image=image)
    sort_reso = 256 if (sorted_path or fused) else None
    loader = PatchLoader(dataset, batch, [16384], fixed_bucket=16384,
                         sort_reso=sort_reso, aligned=bool(fused),
                         prefetch=2, n_workers=4,
                         wire_points="uint16" if wire_u16 else "float32")
    model = build_model(cfg)
    if fused:
        ek = dict(model.encoder_kwargs)
        ek["sorted_impl"] = fused if isinstance(fused, str) else "fused"
        model = model.clone(encoder_kwargs=ek)
    sample = loader.collate([dataset[0]])
    img0 = sample.get("image") if image else None
    if img0 is not None and img0.dtype == np.uint8:  # init wants model dtype
        mean, std = dataset.image_norm
        img0 = (img0.astype(np.float32) - mean) / std
    if image and device_img:  # no crop on the wire: init from shapes alone
        h, w = (int(v) for v in dataset._image_patch_shape)
        img0 = np.zeros((1, h, w, dataset.norm_image_data.shape[0]),
                        np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), sample["points"], sample["point_mask"], img0,
        sample.get("cell"), sample.get("cell_offsets"))
    gen = DSMGenerator(model, lambda: params, loader,
                       dsm_pixel_size=cfg["dsm_generation"]["pixel_size"],
                       half_blend_percent=cfg["dsm_generation"].get("half_blend_percent"),
                       crs_epsg=cfg["dsm_generation"].get("crs_epsg"),
                       use_cloud=True, use_image=image, mesh=None,
                       device_blend=device_blend,
                       blend_loop="scan" if blend_scan else "unroll",
                       # serving wire format: f16 halves the dominant
                       # stitched-raster download (<= ~5 cm quantization)
                       wire_dtype="float16" if device_blend else "float32")
    out_tiff = os.path.join(root, "bench_dsm.tiff")
    runs = []
    for _ in range(iters + 1):  # +1 warmup/compile iteration
        gen.generate_dsm(out_tiff)
        runs.append(gen.last_stats)
    runs = runs[1:]  # drop compile/warmup
    runs.sort(key=lambda s: s["patches_per_s"])
    median = dict(runs[len(runs) // 2])
    median["best_patches_per_s"] = runs[-1]["patches_per_s"]
    return median


def main(batch: int | None = None, n_points: int = 16384, iters: int = 40, train: bool = False,
         dtype: str = "bfloat16", scan: int = 0, sorted_path: bool = False,
         e2e: bool = False, fused: bool | str | None = None, big: bool = False,
         device_blend: bool = False, image: bool = False,
         fused_head: bool = False, fused_convs: bool = False,
         wire_u16: bool = False, wire_u8img: bool = False,
         device_img: bool = False, encoder: str | None = None,
         blend_scan: bool = False):
    # mode-aware defaults (r03): serving AND training = fused2 chunk-grid
    # kernels at batch 8 — per-tile kernel cost is batch-independent and
    # convs amortize, so throughput rises monotonically to b8 (serving
    # 74/96/102/99 at b1/4/8/16; the plain path peaked at b1=94.7 and
    # cliffed at b16=54). Training joined fused2 once the FULL backward
    # stack fused (level_bwd_kernel + pool2/scatter_plane2 transposes):
    # 25.5/32.6 p/s at b4/b8 vs plain 16.2/18.8. E2e keeps batch 4
    # (host-transfer bound; device gains invisible behind the relay wire).
    if encoder == "pointnet_plus_plus":
        # the registered alternate encoder (models/pointnetpp.py) has its own
        # FPS/ball-query structure — the Morton chunk-grid kernels are
        # LocalPoolPointnet-specific, so it always runs the plain XLA path
        fused = False
    elif fused is None:
        fused = False if e2e else "fused2"
    elif fused == "none":
        fused = False
    if batch is None:
        batch = 4 if e2e else (8 if fused else 1)
    if e2e:
        stats = e2e_bench(batch, dtype, sorted_path=sorted_path, big=big,
                          fused=fused, device_blend=device_blend, image=image,
                          fused_head=fused_head, fused_convs=fused_convs,
                          wire_u16=wire_u16, wire_u8img=wire_u8img,
                          device_img=device_img, blend_scan=blend_scan)
        print(json.dumps({
            "metric": "ndsm_tiles_per_sec_e2e",
            "value": round(stats["patches_per_s"], 3),  # MEDIAN of iters
            "unit": "tiles/s",
            "vs_baseline": round(stats["patches_per_s"] / 10.0, 3),
            "best": round(stats["best_patches_per_s"], 3),
            "phases": {k: round(v, 4) for k, v in stats.items() if k.endswith("_s")},
            "n_patches": stats["n_patches"],
        }))
        return
    from tomosar2height_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model

    from tomosar2height_tpu.ops.sorted_scatter import host_morton_bucket

    model = _flagship_model(use_image=image)
    if encoder == "pointnet_plus_plus":
        # flagship-scale PointNet++ SSG: same plane/U-Net stage as the
        # default encoder, SA/FP pyramid per models/pointnetpp.py
        model = model.clone(
            encoder="pointnet_plus_plus",
            encoder_kwargs={"feature_dim": 32, "plane_resolution": 256,
                            "unet_type": "alto",
                            "unet_kwargs": {"depth": 5, "start_filts": 32,
                                            "merge_mode": "concat"}})
    if dtype != "float32":
        model = model.clone(dtype=jnp.dtype(dtype))
    if fused_head:
        # one-pallas_call ConvDecoder head (ops/pallas/decoder_kernel.py)
        dk = dict(model.decoder_kwargs or {})
        dk["fused_head"] = True
        model = model.clone(decoder_kwargs=dk)
    if fused_convs:
        # band-fused conv3x3 pairs in ALTO + the image U-Net
        # (ops/pallas/convpair_kernel.py)
        ek = dict(model.encoder_kwargs)
        ek["unet_kwargs"] = dict(ek.get("unet_kwargs") or {},
                                 fused_convs=True)
        kw = {"encoder_kwargs": ek}
        if image:
            kw["encoder2_kwargs"] = dict(model.encoder2_kwargs or {},
                                         fused_convs=True)
        model = model.clone(**kw)
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(0.001, 0.999, (batch, n_points, 3)).astype(np.float32)
    mask_np = np.ones((batch, n_points), dtype=bool)
    RESO = 256
    if fused:  # chunk-aligned Morton layout + Pallas tile kernels
        from tomosar2height_tpu.ops.pallas.gather_kernel import CHUNK
        from tomosar2height_tpu.ops.sorted_scatter import (
            aligned_bucket_size,
            host_morton_bucket_aligned,
        )

        from tomosar2height_tpu.data.pipeline import tile_cells_for_impl

        ek = dict(model.encoder_kwargs)
        ek["sorted_impl"] = fused if isinstance(fused, str) else "fused"
        model = model.clone(encoder_kwargs=ek)
        tc = tile_cells_for_impl(ek["sorted_impl"])
        npad = aligned_bucket_size(n_points, RESO, CHUNK, tc)
        apts = np.full((batch, npad, 3), 0.5, np.float32)
        amask = np.zeros((batch, npad), bool)
        acell = np.zeros((batch, npad), np.int32)
        atoff = np.zeros((batch, RESO * RESO // tc + 1), np.int32)
        for i in range(batch):
            a = host_morton_bucket_aligned(pts_np[i], mask_np[i], RESO, CHUNK,
                                           tc)
            apts[i], amask[i], acell[i], atoff[i] = (
                a["points"], a["mask"], a["cells"], a["tile_offsets"])
        from tomosar2height_tpu.ops.sorted_scatter import trim_aligned_batch

        apts, amask, acell, atoff = trim_aligned_batch(apts, amask, acell, atoff)
        pts_np, mask_np = apts, amask
        cells = jnp.asarray(acell)
        offsets = jnp.asarray(atoff)
    elif sorted_path:  # Morton-sorted alternative (r01 path; kept for A/B)
        cells_np = np.empty((batch, n_points), np.int32)
        offs_np = np.empty((batch, RESO * RESO + 1), np.int32)
        for i in range(batch):
            order, cells_np[i], offs_np[i] = host_morton_bucket(pts_np[i], mask_np[i], RESO)
            pts_np[i] = pts_np[i][order]
        cells = jnp.asarray(cells_np)
        offsets = jnp.asarray(offs_np)
    else:
        cells = offsets = None
    points = jnp.asarray(pts_np)
    mask = jnp.asarray(mask_np)
    # cloud+image fusion: a normalized 512^2 RGB crop per tile (NHWC)
    img = (jnp.asarray(rng.normal(size=(batch, 512, 512, 3)).astype(np.float32))
           if image else None)

    init_key = jax.random.PRNGKey(0)
    params = model.init(init_key, points[:1, :256], mask[:1, :256],
                        img[:1] if image else None)

    if train:
        from tomosar2height_tpu.parallel.mesh import make_mesh
        from tomosar2height_tpu.train.trainer import Trainer

        # uint8 image wire A/B: ship raw u8 crops (4x less of the dominant
        # --image upload: 24 MB/step at b8 f32) and normalize inside the step
        norm = ((np.full((3,), 128.0, np.float32),
                 np.full((3,), 64.0, np.float32))
                if (image and wire_u8img) else None)
        trainer = Trainer(model, {"optimize_every": 1}, use_cloud=True,
                          use_image=image, mesh=make_mesh(1), donate=True,
                          image_norm=norm)
        batch_d = {
            "points": np.asarray(points), "point_mask": np.asarray(mask),
            "patch_valid": np.ones((batch,), bool),
            "dsm": rng.uniform(0, 30, (batch, 512, 512)).astype(np.float32),
        }
        if image:
            if wire_u8img:
                batch_d["image"] = rng.integers(
                    0, 256, (batch, 512, 512, 3)).astype(np.uint8)
            else:
                batch_d["image"] = np.asarray(img)
        if cells is not None:  # fused/fused2 training A/B
            batch_d["cell"] = np.asarray(cells)
            batch_d["cell_offsets"] = np.asarray(offsets)
        state = trainer.init_state(init_key, batch_d)
        state = trainer.train_step(state, batch_d, 1e-4)  # compile
        # steady-state loop: batch k+1's host->device upload overlaps batch
        # k's compute (prepare_batch), metrics fetch lazily — ONE barrier at
        # the end, exactly how the real training loop runs
        nxt = trainer.prepare_batch(batch_d)
        t0 = time.perf_counter()
        for _ in range(iters):
            cur = nxt
            nxt = trainer.prepare_batch(batch_d)
            state = trainer.train_step(state, cur, 1e-4)
        float(state.metric_acc[0])  # completion barrier for the whole chain
        dt = time.perf_counter() - t0
        tiles_per_sec = batch * iters / dt
        metric = "train_patches_per_sec_per_chip"
    else:
        # Pipelined serving measurement: dispatch all batches asynchronously
        # (device executes them in order) and fetch ONE scalar at the end —
        # the fetch blocks until the final (and therefore every) batch is done.
        # block_until_ready is a no-op through the axon relay, but an actual
        # device->host value transfer is a true completion barrier.
        if scan > 1:
            # serving mode: K batches per dispatch via lax.map — amortizes the
            # per-call dispatch overhead of the remote runtime
            bc = lambda x: jnp.broadcast_to(x, (scan,) + x.shape)
            if cells is None:
                @jax.jit
                def fwd(params, sp, sm):
                    def one(a):
                        pa, _ = model.apply(params, a[0], a[1], None)
                        return pa.sum()
                    return jax.lax.map(one, (sp, sm)).sum()

                args = (params, bc(points), bc(mask))
            else:
                @jax.jit
                def fwd(params, sp, sm, sc, so):
                    def one(a):
                        pa, _ = model.apply(params, a[0], a[1], None, a[2], a[3])
                        return pa.sum()
                    return jax.lax.map(one, (sp, sm, sc, so)).sum()

                args = (params, bc(points), bc(mask), bc(cells), bc(offsets))
            per_call_tiles = batch * scan
        else:
            @jax.jit
            def fwd(params, points, mask, img, cells, offsets):
                pa, _ = model.apply(params, points, mask, img, cells, offsets)
                return pa.sum()

            args = (params, points, mask, img, cells, offsets)
            per_call_tiles = batch

        float(fwd(*args))  # compile + warmup
        float(fwd(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fwd(*args)
        float(out)  # completion barrier for the whole pipeline
        dt = time.perf_counter() - t0
        tiles_per_sec = per_call_tiles * iters / dt
        metric = "ndsm_tiles_per_sec_per_chip"

    print(json.dumps({
        "metric": metric,
        "value": round(tiles_per_sec, 3),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_sec / 10.0, 3),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    # batch 1 is both the serving-latency config (reference forces bs=1 too)
    # and the fastest measured throughput on this chip: the forward is a swarm
    # of small scatter/gather/conv ops whose working sets stay VMEM-resident
    # at small batch (94.7 t/s at b=1 vs 77.2 at b=4 vs 54.0 at b=16, bf16)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--train", action="store_true")
    # bf16 is the serving default: the f32 regression heads keep height
    # precision (models/decoder.py) and 150-iter flagship training matches
    # f32 val L1 within 3% at every checkpoint (RESULTS.md round 2)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--scan", type=int, default=0,
                    help="batches per dispatch (serving mode)")
    ap.add_argument("--sorted", action="store_true",
                    help="Morton-sorted scatter path (A/B; slower on v5e)")
    ap.add_argument("--e2e", action="store_true",
                    help="end-to-end serving bench: loader + device + f64 "
                         "blend + GeoTIFF write on the synthetic city")
    ap.add_argument("--fused", nargs="?", const="fused", default=None,
                    choices=["fused", "fused2", "none"],
                    help="chunk-aligned Morton layout + Pallas kernels: "
                         "'fused' = per-op tile kernels (r02), 'fused2' = one "
                         "fused gather+MLP+scatter kernel per ALTO level (r03, "
                         "the serving default), 'none' = plain XLA path")
    ap.add_argument("--big", action="store_true",
                    help="with --e2e: 12-chunk 3840x1280 m city (steady-state)")
    ap.add_argument("--device-blend", action="store_true",
                    help="with --e2e: accumulate the blend on-device, fetch "
                         "one stitched raster per scene (f32 accumulation)")
    ap.add_argument("--image", action="store_true",
                    help="cloud+image fusion flagship (the paper's headline "
                         "config): adds the depth-6 512^2 image U-Net; "
                         "serving (non-scan) and --train modes")
    ap.add_argument("--fused-head", action="store_true",
                    help="one-pallas_call ConvDecoder head (whole conv chain "
                         "resident in VMEM; ops/pallas/decoder_kernel.py)")
    ap.add_argument("--fused-convs", action="store_true",
                    help="band-fused conv3x3 pairs in ALTO + the image U-Net "
                         "(ops/pallas/convpair_kernel.py)")
    ap.add_argument("--wire-u16", action="store_true",
                    help="with --e2e: ship point coords as uint16 (halves "
                         "the dominant upload bytes; <=8 mm quantization)")
    ap.add_argument("--wire-u8img", action="store_true",
                    help="with --image (--train or --e2e): ship RGB crops as "
                         "raw uint8 (4x less image upload; lossless for u8 "
                         "sources), normalize on device "
                         "(dataset satellite_image.wire)")
    ap.add_argument("--blend-scan", action="store_true",
                    help="with --e2e --device-blend: roll the per-batch "
                         "blend read-modify-writes into one lax.scan body "
                         "(constant program size in batch) instead of the "
                         "unrolled chain")
    ap.add_argument("--encoder", default=None,
                    choices=["pointnet_local_pool", "pointnet_plus_plus"],
                    help="point encoder for the micro benches (serving/"
                         "--train): 'pointnet_plus_plus' benches the "
                         "registered SSG alternate on the plain XLA path "
                         "(no Morton kernels — they are LocalPoolPointnet-"
                         "specific)")
    ap.add_argument("--device-img", action="store_true",
                    help="with --image --e2e: resident scene image — upload "
                         "the whole scene to HBM once and crop per tile on "
                         "device; tiles ship a (row, col) origin instead of "
                         "a 0.8-3 MB crop (dataset satellite_image.crop)")
    a = ap.parse_args()
    if a.image and a.scan > 1:
        ap.error("--image is not supported with --scan")
    if a.wire_u16 and not (a.e2e and a.fused in ("fused", "fused2")):
        ap.error("--wire-u16 requires --e2e with --fused fused|fused2 "
                 "(the aligned layout)")
    if a.wire_u8img and not (a.image and (a.train or a.e2e)):
        ap.error("--wire-u8img requires --image with --train or --e2e "
                 "(the wire-inclusive image benches)")
    if a.device_img and not (a.image and a.e2e):
        ap.error("--device-img requires --image --e2e (serving only; "
                 "training keeps host crops for augmentation)")
    if a.encoder == "pointnet_plus_plus" and (a.e2e or a.scan > 1
                                              or a.fused not in (None, "none")):
        ap.error("--encoder pointnet_plus_plus supports the micro benches "
                 "only (no --e2e/--scan/--fused)")
    if a.blend_scan and not (a.e2e and a.device_blend):
        ap.error("--blend-scan requires --e2e --device-blend")

    # The axon TPU tunnel has multi-hour outages during which backend init
    # hangs FOREVER (no error). Probe it in a bounded subprocess first so an
    # unattended driver run emits an honest JSON error line instead of
    # hanging past its deadline with nothing recorded.
    import os
    import subprocess
    import sys

    if os.environ.get("TOMOSAR_BENCH_SKIP_PROBE") != "1":
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=int(os.environ.get("TOMOSAR_BENCH_PROBE_TIMEOUT",
                                           "600")),
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print(json.dumps({
                "metric": "tiles_per_sec_per_chip", "value": 0.0,
                "unit": "tiles/s", "vs_baseline": 0.0,
                "error": "device backend unavailable (backend-init probe "
                         "failed/timed out; likely a TPU tunnel outage)"}))
            sys.exit(0)
    try:
        main(a.batch, a.points, a.iters, a.train, a.dtype, a.scan, a.sorted,
             a.e2e, a.fused, a.big, a.device_blend, a.image, a.fused_head,
             a.fused_convs, a.wire_u16, a.wire_u8img, a.device_img, a.encoder,
             a.blend_scan)
    except Exception:
        # Insurance for the driver's unattended run: if the auto-selected
        # fused2 kernel path fails to lower/compile on the live backend,
        # fall back to the plain XLA path (94.7 tiles/s serving, 18.8 p/s
        # training) so the bench still emits its JSON line.
        if a.fused is not None or a.e2e:
            raise
        import sys
        import traceback
        traceback.print_exc(file=sys.stderr)
        print("bench: fused2 default failed; retrying on the plain XLA path",
              file=sys.stderr)
        main(a.batch, a.points, a.iters, a.train, a.dtype, a.scan, a.sorted,
             a.e2e, "none", a.big, a.device_blend, a.image, False, False,
             encoder=a.encoder)
