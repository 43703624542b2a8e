"""Console entry points.

``downscale`` keeps the reference CLI contract exactly
(cli.py:9-26 / setup.py:14): ``--era --dem --date --lon --lat -o``,
reading ``{date}*surface*.nc`` ERA5 files and a GeoTIFF DEM, writing a
NetCDF of downscaled u10/v10.  ``windtpu-train`` and ``windtpu-prepare``
are new: the reference ships no training driver or preprocessing CLI.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Downscale ERA5 wind fields to ~1 km")
    parser.add_argument("--era", required=True,
                        help="path to folder with ERA5 data")
    parser.add_argument("--dem", required=True, help="path to DEM data file")
    parser.add_argument("--date", required=True,
                        help="date to downscale in YYYYMMDD format")
    parser.add_argument("--lon", default=None,
                        help="longitude range (ex: 45.6:46.2)")
    parser.add_argument("--lat", default=None,
                        help="latitude range (ex: 45.6:46.2)")
    parser.add_argument("-o", "--output", default="downscaled.nc",
                        help="output path for the downscaled map (*.nc)")
    parser.add_argument("--weights", default=None,
                        help="Orbax checkpoint with trained weights")
    parser.add_argument("--ensemble", type=int, default=1,
                        help="number of stochastic ensemble members")
    parser.add_argument("--overlap-factor", type=float, default=0.01)
    parser.add_argument("--no-texture-gate", action="store_true",
                        help="disable the flow-conditional texture gate "
                             "(models/texture_gate.py) — raw generator "
                             "output, as the reference CLI produces")
    args = parser.parse_args(argv)

    from windtpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()

    from windtpu import api
    from windtpu.io.dataset import open_mfdataset
    from windtpu.io.geotiff import open_rasterio

    longitude_r = tuple(map(float, args.lon.split(":"))) if args.lon else None
    latitude_r = tuple(map(float, args.lat.split(":"))) if args.lat else None

    era5 = open_mfdataset(str(Path(args.era) / f"{args.date}*surface*.nc"))
    raster = open_rasterio(args.dem)
    network = api.get_network(args.weights)
    result = api.downscale(
        era5, raster, range_lon=longitude_r, range_lat=latitude_r,
        overlap_factor=args.overlap_factor, network=network,
        ensemble_members=args.ensemble,
        texture_gate=False if args.no_texture_gate else "auto")
    result.to_netcdf(args.output)
    print(f"wrote {args.output}")


def train_main(argv=None):
    parser = argparse.ArgumentParser(description="Train the downscaling GAN")
    parser.add_argument("--inputs", required=True,
                        help="dir with x_{date}.nc training inputs")
    parser.add_argument("--outputs", required=True,
                        help="dir with y_{date}.nc training targets")
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=16,
                        help="GLOBAL batch size (sharded over the data "
                             "mesh axis across all hosts)")
    parser.add_argument("--patch-size", type=int, default=32)
    parser.add_argument("--sequence-length", type=int, default=6)
    parser.add_argument("--start-date", default=None)
    parser.add_argument("--end-date", default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="train on synthetic data (smoke test)")
    parser.add_argument("--checkpoint-every", type=int, default=200)
    parser.add_argument("--profile-dir", default=None)
    # Optimization schedule (defaults = reference gan/train.py:34-59;
    # overrides justified by tools/train_shipped_ckpt.py A/Bs).
    parser.add_argument("--g-lr", type=float, default=None,
                        help="generator Adam learning rate (default 1e-4); "
                             "reduce when fine-tuning a warm-started "
                             "checkpoint against a fresh critic")
    parser.add_argument("--d-lr", type=float, default=None,
                        help="critic Adam learning rate (default 4e-4)")
    parser.add_argument("--n-critic", type=int, default=None,
                        help="critic updates per generator update "
                             "(default 3, reference ganbase.py:9)")
    parser.add_argument("--reconstruction-coefficient", type=float,
                        default=None,
                        help="perceptual reconstruction loss weight "
                             "(default 0 = off; uses the bundled encoder)")
    parser.add_argument("--steps-per-call", type=int, default=None,
                        help="optimizer steps per device call (K batches "
                             "scanned inside one program; K=1 default "
                             "keeps per-step logging)")
    parser.add_argument("--steps-per-call-unroll", action="store_true",
                        help="unroll the K-step scan: +6%% steps/s at "
                             "~2.8x compile time — production runs only "
                             "(see ARCHITECTURE.md compile-time matrix)")
    # Multi-host: explicit coordinator flags for clusters without TPU-pod
    # metadata; on Cloud TPU pods plain `windtpu-train` on every host is
    # enough (initialize_distributed picks the env up automatically).
    parser.add_argument("--coordinator-address", default=None,
                        help="host:port of process 0 (multi-host DP)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args(argv)

    # Multi-host first, before ANY JAX call that initializes the XLA
    # backend (enable_persistent_cache queries jax.default_backend()):
    # every host must join the coordinator so jax.devices() is the GLOBAL
    # device list (parallel/distributed.py; no-op single-process).
    from windtpu.parallel.distributed import initialize_distributed
    initialize_distributed(args.coordinator_address, args.num_processes,
                           args.process_id)

    from windtpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()

    import jax

    from windtpu.core.config import DataConfig, GANConfig, ModelConfig, TrainConfig
    from windtpu.core.mesh import make_mesh
    from windtpu.data import BatchGenerator, LocalFileProvider, SyntheticDayProvider
    from windtpu.train.loop import train

    dcfg = DataConfig(sequence_length=args.sequence_length,
                      patch_size=args.patch_size,
                      batch_size=args.batch_size)
    overrides = {
        k: v for k, v in {
            "g_learning_rate": args.g_lr,
            "d_learning_rate": args.d_lr,
            "n_critic": args.n_critic,
            "reconstruction_coefficient": args.reconstruction_coefficient,
            "steps_per_call": args.steps_per_call,
        }.items() if v is not None}
    if args.steps_per_call_unroll:
        overrides["steps_per_call_unroll"] = True
    cfg = GANConfig(
        model=ModelConfig(image_size=args.patch_size,
                          in_channels=len(dcfg.input_variables),
                          sequence_length=args.sequence_length),
        train=TrainConfig(batch_size=args.batch_size, **overrides),
        data=dcfg,
        checkpoint_dir=args.checkpoint_dir,
    )
    if args.synthetic:
        dates = [f"2020010{i}" for i in range(1, 8)]
        in_prov = SyntheticDayProvider(dates, dcfg.input_variables,
                                       ny=64, nx=64, nt=24)
        out_prov = SyntheticDayProvider(dates, dcfg.output_variables,
                                        ny=64, nx=64, nt=24, seed=7)
    else:
        in_prov = LocalFileProvider(args.inputs, "x_{date}.nc")
        out_prov = LocalFileProvider(args.outputs, "y_{date}.nc")
    bg = BatchGenerator(in_prov, output_provider=out_prov,
                        start_date=args.start_date, end_date=args.end_date,
                        config=dcfg, num_workers=2)
    if jax.process_count() > 1:
        # Multi-host: the ('data',) axis spans every chip of every host;
        # the global batch must divide evenly (each host transfers its
        # contiguous slice, data/batch.py as_device_iterator).
        n = jax.device_count()
        if args.batch_size % n:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by the "
                f"global device count {n} in multi-host runs")
    else:
        # Largest device count that divides the batch (batch 2 on an
        # 8-chip mesh would otherwise fail to shard).
        n = jax.device_count()
        while args.batch_size % n:
            n -= 1
    mesh = make_mesh({"data": n})
    state, _ = train(cfg, bg.as_device_iterator(mesh), num_steps=args.steps,
                     checkpoint_every=args.checkpoint_every,
                     profile_dir=args.profile_dir, mesh=mesh)
    print(f"done at step {int(state.step)}")
    return state


def prepare_main(argv=None):
    parser = argparse.ArgumentParser(
        description="Preprocess DEM + ERA5 + COSMO into daily training files")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_topo = sub.add_parser("topo", help="DEM -> topographic descriptors")
    p_topo.add_argument("--dem", required=True)

    p_daily = sub.add_parser("daily", help="build daily x_/y_ NetCDF files")
    p_daily.add_argument("--processed", required=True)
    p_daily.add_argument("--era5", required=True)
    p_daily.add_argument("--cosmo", required=True)
    p_daily.add_argument("--dem-dir", required=True)
    p_daily.add_argument("--start", required=True)
    p_daily.add_argument("--end", required=True)
    p_daily.add_argument("--blurred", action="store_true",
                         help="COSMO-blurred self-downscaling variant")

    args = parser.parse_args(argv)
    from windtpu.preprocess import daily, topo

    if args.cmd == "topo":
        topo.process_topographic_variables_file(args.dem)
    else:
        if args.blurred:
            daily.process_imgs_cosmoblurred(
                args.processed, args.cosmo, args.dem_dir, args.start,
                args.end)
        else:
            daily.process_imgs(args.processed, args.era5, args.cosmo,
                               args.dem_dir, args.start, args.end)


if __name__ == "__main__":
    main()
