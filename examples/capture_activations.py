"""Capture microphone audio around wake-word activations to WAV files.

Equivalent of the reference's activation-capture example (reference
examples/capture_activations.py): on every activation above --threshold,
saves the surrounding audio context and applies a cooldown so one utterance
produces one file.

Usage:
    python capture_activations.py --output_dir ./captures --threshold 0.5 \
        --model alexa
"""

import argparse
import collections
import os
import time
from datetime import datetime

import numpy as np

import openwakeword_tpu as oww
from openwakeword_tpu.data import write_audio

parser = argparse.ArgumentParser()
parser.add_argument("--output_dir", type=str, default="./activations")
parser.add_argument("--threshold", type=float, default=0.5)
parser.add_argument("--vad_threshold", type=float, default=0.0)
parser.add_argument("--noise_suppression", action="store_true")
parser.add_argument("--chunk_size", type=int, default=1280)
parser.add_argument("--model", type=str, default="",
                    help="Model path or pretrained name (default: all)")
parser.add_argument("--save_seconds", type=float, default=4.0,
                    help="Seconds of audio context saved per activation")
parser.add_argument("--cooldown", type=float, default=2.0,
                    help="Seconds to wait before another capture per model")
args = parser.parse_args()


def main():
    import pyaudio

    os.makedirs(args.output_dir, exist_ok=True)
    audio = pyaudio.PyAudio()
    mic_stream = audio.open(format=pyaudio.paInt16, channels=1, rate=16000,
                            input=True, frames_per_buffer=args.chunk_size)

    model = oww.Model(
        wakeword_models=[args.model] if args.model else [],
        vad_threshold=args.vad_threshold,
        enable_speex_noise_suppression=args.noise_suppression,
    )

    context = collections.deque(maxlen=int(16000 * args.save_seconds))
    last_capture = collections.defaultdict(float)

    print("Listening (captures land in %s)..." % args.output_dir)
    while True:
        frame = np.frombuffer(mic_stream.read(args.chunk_size), dtype=np.int16)
        context.extend(frame)
        predictions = model.predict(frame)
        now = time.time()
        for label, score in predictions.items():
            if score >= args.threshold and now - last_capture[label] >= args.cooldown \
               and len(context) == context.maxlen:
                fname = f"{label}_{datetime.now().strftime('%Y%m%d_%H%M%S')}.wav"
                write_audio(os.path.join(args.output_dir, fname),
                            np.array(context, dtype=np.int16))
                last_capture[label] = now
                print(f"Captured activation for '{label}' (score {score:.3f}) -> {fname}")


if __name__ == "__main__":
    main()
