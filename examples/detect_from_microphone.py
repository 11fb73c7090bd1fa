"""Live wake-word detection from a microphone.

TPU-native equivalent of the reference's microphone demo (reference
examples/detect_from_microphone.py): streams 80 ms frames through the engine
and renders a live score table. Requires pyaudio.

Usage:
    python detect_from_microphone.py --model_path alexa --chunk_size 1280
"""

import argparse
import sys

import numpy as np

import openwakeword_tpu as oww

parser = argparse.ArgumentParser()
parser.add_argument("--chunk_size", type=int, default=1280,
                    help="How many audio samples to predict on at once")
parser.add_argument("--model_path", type=str, default="",
                    help="Model path or pretrained model name (default: all)")
parser.add_argument("--vad_threshold", type=float, default=0.0,
                    help="Silero-style VAD gating threshold (0 disables)")
parser.add_argument("--noise_suppression", action="store_true",
                    help="Enable the native noise-suppression preprocessor")
parser.add_argument("--threshold", type=float, default=0.5,
                    help="Score at or above which a detection is shown")
args = parser.parse_args()


def render_table(scores: dict, threshold: float) -> str:
    """One fixed-width table frame: a header plus one row per label."""
    name_w = max(12, max((len(k) for k in scores), default=0))
    lines = [f"{'label':<{name_w}}  score   status",
             "-" * (name_w + 26)]
    for label, score in scores.items():
        status = "DETECTED" if score >= threshold else ""
        lines.append(f"{label:<{name_w}}  {max(score, 0.0):.3f}   {status:<10}")
    return "\n".join(lines)


def main():
    import pyaudio

    audio = pyaudio.PyAudio()
    mic_stream = audio.open(format=pyaudio.paInt16, channels=1, rate=16000,
                            input=True, frames_per_buffer=args.chunk_size)

    model = oww.Model(
        wakeword_models=[args.model_path] if args.model_path else [],
        vad_threshold=args.vad_threshold,
        enable_speex_noise_suppression=args.noise_suppression,
    )

    print("Listening for wakewords... (ctrl-c to stop)\n")
    table_height = 0
    try:
        while True:
            frame = np.frombuffer(mic_stream.read(args.chunk_size), dtype=np.int16)
            scores = model.predict(frame)
            table = render_table(scores, args.threshold)
            if table_height:
                # move the cursor back to the top of the previous frame and
                # clear downwards, so the table redraws in place
                sys.stdout.write(f"\x1b[{table_height}A\x1b[0J")
            sys.stdout.write(table + "\n")
            sys.stdout.flush()
            table_height = table.count("\n") + 1
    except KeyboardInterrupt:
        print("\nstopped")
    finally:
        mic_stream.stop_stream()
        mic_stream.close()
        audio.terminate()


if __name__ == "__main__":
    main()
