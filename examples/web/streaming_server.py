"""Websocket wake-word scoring server.

Equivalent of the reference's web example (reference
examples/web/streaming_server.py): serves streaming_client.html and accepts
16-bit PCM audio over a websocket, replying with JSON activations. The first
text message from the client declares its sample rate; non-16 kHz input is
resampled with a polyphase numpy resampler (no resampy dependency).

Usage:
    python streaming_server.py --model_path alexa [--port 9000]
"""

import argparse
import json
import os

import numpy as np

import openwakeword_tpu as oww

parser = argparse.ArgumentParser()
parser.add_argument("--chunk_size", type=int, default=1280)
parser.add_argument("--model_path", type=str, default="")
parser.add_argument("--port", type=int, default=9000)
args = parser.parse_args()


def resample_to_16k(x: np.ndarray, sr: int) -> np.ndarray:
    if sr == 16000:
        return x
    from math import gcd
    g = gcd(sr, 16000)
    up, down = 16000 // g, sr // g
    from scipy.signal import resample_poly
    return resample_poly(x.astype(np.float32), up, down).astype(np.int16)


def main():
    from aiohttp import web, WSMsgType

    async def index(request):
        return web.FileResponse(os.path.join(os.path.dirname(__file__),
                                             "streaming_client.html"))

    async def websocket_handler(request):
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        sample_rate = 16000
        buffer = np.zeros(0, dtype=np.int16)
        # per-connection Model: streaming state (feature ring, prediction
        # buffer) is stateful, so concurrent clients must not share one
        # instance (the jitted device programs are shared process-wide
        # regardless, so this costs no extra compiles)
        model = oww.Model(wakeword_models=[args.model_path] if args.model_path else [])

        async for msg in ws:
            if msg.type == WSMsgType.TEXT:
                sample_rate = int(msg.data)
            elif msg.type == WSMsgType.BINARY:
                audio = np.frombuffer(msg.data, dtype=np.int16)
                audio = resample_to_16k(audio, sample_rate)
                buffer = np.concatenate([buffer, audio])
                activations = []
                while buffer.shape[0] >= args.chunk_size:
                    predictions = model.predict(buffer[:args.chunk_size])
                    buffer = buffer[args.chunk_size:]
                    activations.extend([k for k, v in predictions.items() if v >= 0.5])
                await ws.send_str(json.dumps({
                    "activations": sorted(set(activations)),
                    "scores": {k: float(v[-1]) for k, v in
                               ((k, list(model.prediction_buffer[k])) for k in model.prediction_buffer)
                               if v},
                }))
        return ws

    app = web.Application()
    app.add_routes([web.get("/", index), web.get("/ws", websocket_handler)])
    web.run_app(app, host="0.0.0.0", port=args.port)


if __name__ == "__main__":
    main()
