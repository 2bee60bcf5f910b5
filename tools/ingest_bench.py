"""Host-ingest rehearsal: can the data pipeline FEED the chip?

Generates a synthetic Affwild2-LAYOUT directory tree (per-video label CSVs
`img,V,A,frame_id`, realtimestamp files, 112x112 JPEG frames, per-anchor
16-bit 44.1 kHz WAVs — the exact file surface the reference trains from,
dataset_new.py:71-99/262-274/305-308) and measures the REAL file-based
pipeline end-to-end: load_video_records -> WindowedDataset(train) ->
PrefetchLoader -> collated uint8/f32 batches, with the native C++ decoder
(native/jmt_dataio.cc, libjpeg + pthread pool) and with the pure-Python
fallback.

The number to compare against is the device rate (bench.py: 845 clips/s
on one v5e chip, frozen-train == inference). Ingest scales with host
cores (this image has ONE) and across hosts via PrefetchLoader's
host_shard — the per-core rate printed here is the planning number.

Run:  PYTHONPATH=. python tools/ingest_bench.py [n_videos] [length]
"""
import json
import os
import shutil
import sys
import time
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/jmt_ingest_tree"


def generate_tree(n_videos=2, length=481, fps=30.0, seed=0,
                  root=ROOT):
    from PIL import Image

    rng = np.random.default_rng(seed)
    labels = os.path.join(root, "labels")
    ts_dir = os.path.join(root, "timestamps")
    wavs = os.path.join(root, "wavs")
    frames = os.path.join(root, "frames")
    if os.path.isdir(root):
        shutil.rmtree(root)
    for d in (labels, ts_dir, wavs, frames):
        os.makedirs(d)
    wav_len = int(round(32 / fps * 44100))  # one 32-frame chunk of audio
    t0 = time.perf_counter()
    n_jpeg = n_wav = 0
    for vi in range(n_videos):
        vid = f"{vi + 1:03d}"
        vdir = os.path.join(frames, vid)
        wdir = os.path.join(wavs, vid)
        os.makedirs(vdir)
        os.makedirs(wdir)
        rows = ["img,V,A,frame_id"]
        for f in range(1, length + 1):
            img_path = os.path.join(vdir, f"{f:05d}.jpg")
            # smooth-ish random frame (jpeg-compressible, realistic size)
            base = rng.integers(0, 255, (14, 14, 3), np.uint8)
            img = np.asarray(Image.fromarray(base).resize((112, 112)))
            Image.fromarray(img).save(img_path, quality=90)
            n_jpeg += 1
            v, a = rng.uniform(-1, 1, 2)
            rows.append(f"{img_path},{v:.4f},{a:.4f},{f}")
            # per-anchor wav (dataset_new.py:113: {wavdir}/{frameidx}.wav)
            pcm = (rng.normal(size=wav_len) * 3000).astype("<i2")
            with wave.open(os.path.join(wdir, f"{f}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(44100)
                w.writeframes(pcm.tobytes())
            n_wav += 1
        with open(os.path.join(labels, vid + ".csv"), "w") as f:
            f.write("\n".join(rows) + "\n")
        with open(os.path.join(ts_dir, vid + "_video_ts.txt"), "w") as f:
            f.write("header\n" + "\n".join(
                f"{i / fps:.4f}" for i in range(length)) + "\n")
    gen_s = time.perf_counter() - t0
    return dict(labels=labels, ts=ts_dir, wavs=wavs,
                n_jpeg=n_jpeg, n_wav=n_wav, gen_s=round(gen_s, 1))


def measure(tree, use_native, batch_size=8):
    from jmt_tpu.data.datasets import load_video_records, WindowedDataset
    from jmt_tpu.data.loader import PrefetchLoader

    records = load_video_records(tree["labels"], tree["wavs"], tree["ts"])
    ds = WindowedDataset(records, "train", use_native=use_native)
    loader = PrefetchLoader(ds, batch_size=batch_size, shuffle=True,
                            rng=np.random.default_rng(0))
    n_clips = 0
    t0 = time.perf_counter()
    for batch in loader:
        n_clips += batch.clips.shape[0] * batch.clips.shape[1]
    dt = time.perf_counter() - t0
    return {
        "native": bool(use_native and ds.use_native),
        "samples": len(ds),
        "clips": n_clips,
        "clips_per_s": round(n_clips / dt, 1),
        "jpeg_decodes_per_s": round(n_clips * 8 / dt, 0),
        "epoch_s": round(dt, 1),
    }


def main(n_videos=2, length=481):
    tree = generate_tree(n_videos, length)
    print(f"tree: {tree['n_jpeg']} jpegs + {tree['n_wav']} wavs "
          f"in {tree['gen_s']}s", flush=True)
    out = {"tree": {k: tree[k] for k in ("n_jpeg", "n_wav")}}
    for use_native in (True, False):
        r = measure(tree, use_native)
        out["native" if r["native"] else "python"] = r
        print(r, flush=True)
    dev_rate = 845.0  # bench.py frozen-train/inference clips/s on v5e-1
    best = max(v["clips_per_s"] for k, v in out.items() if k != "tree")
    out["host_cores_to_feed_one_chip"] = round(dev_rate / best, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2,
         int(sys.argv[2]) if len(sys.argv) > 2 else 481)
