"""Live wake-word detection from a microphone.

TPU-native equivalent of the reference's microphone demo (reference
examples/detect_from_microphone.py): streams 80 ms frames through the engine
and renders a live score table. Requires pyaudio.

Usage:
    python detect_from_microphone.py --model_path alexa --chunk_size 1280
"""

import argparse

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
args = parser.parse_args()


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
    n_models = len(model.models)

    print("\n\n")
    print("#" * 100)
    print("Listening for wakewords...")
    print("#" * 100)
    print("\n" * (n_models * 3))

    while True:
        frame = np.frombuffer(mic_stream.read(args.chunk_size), dtype=np.int16)
        prediction = model.predict(frame)

        n_spaces = 16
        output_string_header = """
            Model Name         | Score | Wakeword Status
            --------------------------------------
            """
        for mdl in model.prediction_buffer.keys():
            scores = list(model.prediction_buffer[mdl])
            curr_score = format(scores[-1], '.20f').replace("-", "")
            output_string_header += f"""{mdl}{" " * (n_spaces - len(mdl))}   | {curr_score[0:5]} | {"--" + " " * 20 if scores[-1] <= 0.5 else "Wakeword Detected!"}
            """
        print("\033[F" * (4 * n_models + 1))
        print(output_string_header, "                             ", end='\r')


if __name__ == "__main__":
    main()
