"""Streaming receiver app — the reference ``rx`` binary's role
(`rx.cpp:94-237`): continuous ingest -> streaming sync/demod -> payload sink,
with per-buffer stage tracing flushed once at exit (LOG.txt pattern).

Usage:
  python -m c_ofdm_tpu.apps.rxstream --in capture.bin --format i16 \
      --out decoded.bin [--log LOG.txt] [--metrics metrics.jsonl]

Input formats: i16 (interleaved int16 IQ, scaled by config mult) or
f64 (interleaved float64 IQ, reference data.bin layout).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in", dest="inp", required=True,
                   help="capture file or '-' for stdin")
    p.add_argument("--format", choices=("i16", "f64"), default="i16")
    p.add_argument("--out", default="decoded.bin")
    p.add_argument("--config", default="")
    p.add_argument("--log", default="", help="stage-trace LOG.txt path")
    p.add_argument("--metrics", default="", help="per-frame metrics jsonl")
    p.add_argument("--native-ingest", action="store_true",
                   help="use the C++ ingest ring for file reads (i16 only; NB the replay source loops the file like the reference's cyclic TX)")
    p.add_argument("--max-frames", type=int, default=0)
    args = p.parse_args(argv)

    from c_ofdm_tpu import ModemConfig, load_config, make_frame_spec
    from c_ofdm_tpu.io.trace import StageTrace
    from c_ofdm_tpu.mac.mac import Mac
    from c_ofdm_tpu.models.streaming import StreamingReceiver

    cfg = load_config(args.config) if args.config else ModemConfig()
    spec = make_frame_spec(cfg, dtype=jnp.complex64)
    mac = Mac(frame_bytes=cfg.frame_bytes, spread=cfg.mod_type)
    rxr = StreamingReceiver(spec, max_frames=args.max_frames)
    trace = StageTrace()

    buf_samples = cfg.rx_buf_size * cfg.frame_len

    def buffers():
        if args.native_ingest and args.format == "i16" and args.inp != "-":
            from c_ofdm_tpu.io.ingest import NativeIngest, SRC_FILE_REPLAY
            ing = NativeIngest(SRC_FILE_REPLAY, args.inp, buf_samples, 4)
            # file replay loops forever; stop after covering the file once
            import os
            n_bufs = max(1, os.path.getsize(args.inp) // (buf_samples * 4) + 1)
            for _ in range(n_bufs):
                buf = ing.pop_complex64()
                if buf is None:
                    break
                yield buf / cfg.mult
            ing.close()
            return
        src = sys.stdin.buffer if args.inp == "-" else open(args.inp, "rb")
        itemsize = 4 if args.format == "i16" else 16
        while True:
            raw = src.read(buf_samples * itemsize)
            if not raw:
                break
            if args.format == "i16":
                d = np.frombuffer(raw, dtype=np.int16).astype(np.float32)
                block = (d[0::2] + 1j * d[1::2]) / cfg.mult
            else:
                d = np.frombuffer(raw, dtype=np.float64)
                block = (d[0::2] + 1j * d[1::2]).astype(np.complex64)
            if block.size < buf_samples:
                block = np.pad(block, (0, buf_samples - block.size))
            yield block
        if src is not sys.stdin.buffer:
            src.close()

    out_f = open(args.out, "wb")
    n_frames = 0
    n_crc_bad = 0
    metrics_rows = []
    for i, block in enumerate(buffers()):
        trace.iter_start(ITER=i)
        out = rxr.feed(block)
        trace.point("RX_STEP")
        valid = np.asarray(out.valid)
        for k in np.nonzero(valid)[0]:
            fr = mac.read_soft(out.diag[k])
            ok = bool(np.asarray(fr.valid))
            n_crc_bad += (not ok)
            out_f.write(np.asarray(fr.payload).tobytes())
            if args.metrics:
                metrics_rows.append({
                    "buf": i, "slot": int(k),
                    "pos": int(np.asarray(out.positions)[k]),
                    "seq": int(np.asarray(fr.seq)),
                    "cfo": float(np.asarray(out.cfo)[k]),
                    "crc_ok": ok,
                })
            n_frames += 1
        trace.point("MAC")
        trace.value("DET", n_frames)
        trace.value("FR_IN_BUF", int(valid.sum()))
    out_f.close()

    if args.log:
        trace.to_log_txt(args.log)
    if args.metrics:
        import json
        with open(args.metrics, "w") as f:
            for r in metrics_rows:
                f.write(json.dumps(r) + "\n")
    print(f"decoded {n_frames} frames ({n_crc_bad} CRC failures) "
          f"-> {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
