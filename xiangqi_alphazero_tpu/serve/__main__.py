"""Serving CLI.

  python -m xiangqi_alphazero_tpu.serve api --port 5000 --model-dirs models
  python -m xiangqi_alphazero_tpu.serve export --checkpoint ckpt/best_model \
      --format torch|npz|onnx|torchscript --output model.pt

Export parity with the reference CLI (training/export_model.py:90-101).
"""

import argparse
import sys


def main(argv=None) -> int:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="xiangqi_alphazero_tpu.serve")
    sub = p.add_subparsers(dest="cmd", required=True)

    ap = sub.add_parser("api", help="run the human-vs-AI REST API")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--model-dirs", nargs="*", default=None)
    ap.add_argument(
        "--warm-session-buckets", action="store_true",
        help="pre-compile every session-coalescing batch shape at model "
             "load (slower load, no compile stall on first coalesce)",
    )
    ap.add_argument(
        "--search", choices=["puct", "gumbel"], default="puct",
        help="puct = the reference's search semantics; gumbel = the "
             "sequential-halving root (stronger per simulation — pair "
             "with a low num_simulations for low-latency serving)",
    )

    ep = sub.add_parser("export", help="export a trained model")
    ep.add_argument("--checkpoint", required=True)
    ep.add_argument(
        "--format",
        choices=["torch", "npz", "onnx", "torchscript"],
        default="torch",
    )
    ep.add_argument("--output", required=True)
    ep.add_argument(
        "--no-verify", action="store_true",
        help="skip the numeric round-trip check of the exported artifact",
    )

    args = p.parse_args(argv)

    if args.cmd == "api":
        from .api import serve

        serve(args.host, args.port, args.model_dirs,
              warm_sessions=args.warm_session_buckets,
              search_algo=args.search)
        return 0

    from .export import (
        export_npz,
        export_onnx,
        export_torch_checkpoint,
        export_torchscript,
        verify_export,
    )
    from .predictor import Predictor

    pred = Predictor.load(args.checkpoint)
    mc = {
        "num_channels": pred.net.channels,
        "num_res_blocks": pred.net.blocks,
    }
    params = pred.variables["params"]
    stats = pred.variables["batch_stats"]
    try:
        if args.format == "npz":
            export_npz(args.output, params, stats, mc)
        elif args.format == "torch":
            export_torch_checkpoint(args.output, params, stats, mc)
        elif args.format == "torchscript":
            export_torchscript(args.output, params, stats, mc)
        else:
            export_onnx(args.output, params, stats, mc)
    except RuntimeError as e:  # e.g. onnx backend not installed
        print(f"export failed: {e}")
        return 1
    print(f"exported {args.format} -> {args.output}")
    if not args.no_verify:
        try:
            diffs = verify_export(args.format, args.output, params, stats, mc)
        except RuntimeError as e:  # e.g. onnxruntime not installed
            print(f"verification skipped: {e}")
        else:
            print(
                "verified against the JAX forward: "
                f"max|dlogits|={diffs['max_abs_dlogits']:.2e} "
                f"max|dvalue|={diffs['max_abs_dvalue']:.2e}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
