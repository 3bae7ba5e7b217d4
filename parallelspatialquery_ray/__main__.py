"""CLI — the engine's mirror of the reference's console contract.

The reference is one binary driven by argv: k, input file, training file,
threads, accuracy, stripes, result saving, cross-validation flag
(/root/reference/PlaneSweepParallel/src/PlaneSweepParallel.cpp:40-133), plus
two data tools (DatasetGenerator, DatasetMultiplier).  Here:

    python -m parallelspatialquery_ray knn \
        --input pts.bin --training pts.bin --k 10 --out /tmp/knn_out \
        [--res N] [--halo-margin M] [--num-cpus N] [--compare] \
        [--accuracy 1e-15] [--text-output out.txt] [--checkpoint]

    python -m parallelspatialquery_ray gen --n 100000 --family uniform \
        --seed 1 --out pts.bin            # DatasetGenerator/main.cpp parity
    python -m parallelspatialquery_ray multiply --factor 4 \
        --input pts.bin --out big.bin     # DatasetMultiplier parity

Input files: ``.bin`` (reference binary), ``.parquet``, or whitespace text
``id x y`` (reference text format).
"""

from __future__ import annotations

import argparse
import json
import sys


def _read_any(path: str):
    import ray.data
    if path.endswith(".parquet") or path.endswith(".lance"):
        from .sources.storage import read_table
        return read_table(path)
    from .sources.pointfile import read_points
    return read_points(path)


def cmd_knn(args) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    inp = _read_any(args.input)
    trn = inp if args.training in (None, args.input) else _read_any(args.training)

    if args.checkpoint:
        from .pipelines.aknn_pipeline import load_result, run_aknn
        summary = run_aknn(inp, trn, args.k, args.out, res=args.res,
                           halo_margin=args.halo_margin,
                           lineage={"input": args.input,
                                    "training": args.training or args.input})
        print(json.dumps(summary))
        result = load_result(args.out, sort=True)
    else:
        from .stages.knn import aknn_join
        result = aknn_join(inp, trn, args.k, res=args.res,
                           halo_margin=args.halo_margin)
        result.write_parquet(args.out)
        result = None
        import ray.data as rd
        result = rd.read_parquet(args.out)

    if args.compare or args.text_output:
        df = result.to_pandas()
        if args.text_output:
            from .sources.pointfile import write_neighbor_text
            write_neighbor_text(df, args.text_output)
        if args.compare:
            # cross-validate against the broadcast brute-force oracle —
            # exactly the reference's first-enabled-algorithm protocol
            from .sources.pointfile import find_differences
            from .stages.knn import aknn_broadcast
            oracle = aknn_broadcast(inp, trn, args.k).to_pandas()
            diff = find_differences(df, oracle, accuracy=args.accuracy)
            print(json.dumps({"find_differences": diff}))
            if diff["n_diff"] != 0:
                sys.exit(2)
    ray.shutdown()


def cmd_gen(args) -> None:
    import numpy as np

    from .sources import synth
    x, y = synth.FAMILIES[args.family](args.n, seed=args.seed)
    ids = np.arange(1, args.n + 1, dtype=np.int64)  # dense 1-based like ref
    if args.out.endswith(".bin"):
        from .sources.pointfile import write_points_bin
        write_points_bin(ids, x, y, args.out)
    else:
        import pyarrow as pa
        import pyarrow.parquet as pq
        pq.write_table(pa.table({"doc_id": pa.array(ids), "x": pa.array(x),
                                 "y": pa.array(y)}), args.out)
    print(json.dumps({"n": args.n, "out": args.out}))


def cmd_multiply(args) -> None:
    """DatasetMultiplier parity (/root/reference/DatasetMultiplier/main.cpp):
    factor 4 (or 2): shrink into quadrants (halves); factor -1/-2: keep
    every other row, renumbered."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sources import synth
    from .sources.pointfile import write_points_bin

    if args.input.endswith(".bin"):
        raw = np.fromfile(args.input, dtype=np.uint8)
        n = int(np.frombuffer(raw[:8].tobytes(), dtype=np.uint64)[0])
        rec = np.frombuffer(raw[8:8 + 24 * n].tobytes(),
                            dtype=[("id", "<u8"), ("x", "<f8"), ("y", "<f8")])
        x, y = rec["x"].copy(), rec["y"].copy()
    else:
        t = pq.read_table(args.input)
        x, y = t["x"].to_numpy(), t["y"].to_numpy()

    if args.factor == 4:
        x, y = synth.points_quadrupled(x, y)
    elif args.factor == 2:
        hx, hy = x / 2.0, y / 2.0
        x = np.concatenate([np.stack([hx, hx + 0.5], 1).ravel()])
        y = np.concatenate([np.stack([hy, hy], 1).ravel()])
    elif args.factor in (-1, -2):
        x, y = x[::2], y[::2]
    else:
        raise SystemExit(f"unsupported factor {args.factor}")
    ids = np.arange(1, len(x) + 1, dtype=np.int64)
    if args.out.endswith(".bin"):
        write_points_bin(ids, x, y, args.out)
    else:
        import pyarrow as pa
        pq.write_table(pa.table({"doc_id": pa.array(ids), "x": pa.array(x),
                                 "y": pa.array(y)}), args.out)
    print(json.dumps({"n": len(x), "out": args.out}))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="parallelspatialquery_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    k = sub.add_parser("knn", help="all-kNN join (the reference's query)")
    k.add_argument("--input", required=True)
    k.add_argument("--training", default=None,
                   help="defaults to --input (self-join, like "
                        "run_realdata_self.cmd)")
    k.add_argument("--k", type=int, default=10)
    k.add_argument("--out", required=True)
    k.add_argument("--res", type=int, default=None)
    k.add_argument("--halo-margin", type=float, default=0.25)
    k.add_argument("--num-cpus", type=int, default=None)
    k.add_argument("--accuracy", type=float, default=1e-15)
    k.add_argument("--compare", action="store_true",
                   help="cross-validate vs brute force (reference case 0)")
    k.add_argument("--text-output", default=None,
                   help="also write the reference's neighbor-list text format")
    k.add_argument("--checkpoint", action="store_true",
                   help="resumable manifest-checkpointed run")
    k.set_defaults(fn=cmd_knn)

    g = sub.add_parser("gen", help="dataset generator (DatasetGenerator parity)")
    g.add_argument("--n", type=int, required=True)
    g.add_argument("--family", default="uniform",
                   choices=["uniform", "clustered", "zipf"])
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--out", required=True)
    g.set_defaults(fn=cmd_gen)

    m = sub.add_parser("multiply", help="DatasetMultiplier parity")
    m.add_argument("--input", required=True)
    m.add_argument("--factor", type=int, required=True)
    m.add_argument("--out", required=True)
    m.set_defaults(fn=cmd_multiply)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
