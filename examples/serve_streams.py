"""Multi-stream serving demo: score many concurrent audio files as live
streams through the StreamServer slot pool.

Usage:
    python serve_streams.py --input_dir /path/to/wavs --model alexa \
        --capacity 64 --threshold 0.5
"""

import argparse
import os

import numpy as np

from openwakeword_tpu.data import read_audio
from openwakeword_tpu.parallel.server import StreamServer

parser = argparse.ArgumentParser()
parser.add_argument("--input_dir", type=str, required=True)
parser.add_argument("--model", type=str, default="")
parser.add_argument("--capacity", type=int, default=64)
parser.add_argument("--threshold", type=float, default=0.5)
args = parser.parse_args()


def main():
    server = StreamServer(wakeword_models=[args.model] if args.model else [],
                          capacity=args.capacity, threshold=args.threshold)
    files = [os.path.join(args.input_dir, f)
             for f in sorted(os.listdir(args.input_dir)) if f.endswith(".wav")]

    pending = list(files)
    sid_to_file = {}
    print(f"Serving {len(files)} clips through {args.capacity} stream slots...")
    while pending or sid_to_file:
        # attach new streams while capacity allows
        while pending and server._free:
            path = pending.pop()
            sid = server.add_stream()
            sid_to_file[sid] = path
            pcm = (read_audio(path) * 32767).astype(np.int16)
            server.push(sid, pcm)

        server.step()

        done = [sid for sid in sid_to_file if server.pending_frames(sid) == 0]
        for sid in done:
            for label, frame, score in server.poll(sid):
                print(f"{os.path.basename(sid_to_file[sid])}: "
                      f"'{label}' at frame {frame} (score {score:.3f})")
            server.remove_stream(sid)
            del sid_to_file[sid]
    print("Done.")


if __name__ == "__main__":
    main()
