"""FFMPEG export sink: pipes raw frames into a spawned ffmpeg process.

ref: src/core/exporting/ffmpeg.zig — the reference spawns `ffmpeg` with a
rawvideo stdin pipe and writes one RGB frame per rendered frame.
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np


class FfmpegSink:
    """Video sink; one `write_frame(srgb8[H,W,3])` per frame, then `close`."""

    def __init__(self, path: str, resolution: tuple, framerate: int = 30):
        self.path = path
        self.resolution = resolution
        self.framerate = framerate
        self.proc = None

    def command(self) -> list[str]:
        w, h = self.resolution
        return [
            "ffmpeg",
            "-y",
            "-f", "rawvideo",
            "-pix_fmt", "rgb24",
            "-s", f"{w}x{h}",
            "-r", str(self.framerate),
            "-i", "-",
            "-c:v", "libx264",
            "-pix_fmt", "yuv420p",
            self.path,
        ]

    def start(self):
        if shutil.which("ffmpeg") is None:
            raise RuntimeError("ffmpeg not found in PATH")
        self.proc = subprocess.Popen(self.command(), stdin=subprocess.PIPE)
        return self

    def write_frame(self, srgb8: np.ndarray):
        if self.proc is None:
            self.start()
        h, w = srgb8.shape[:2]
        assert (w, h) == tuple(self.resolution)
        self.proc.stdin.write(np.ascontiguousarray(srgb8[..., :3], dtype=np.uint8).tobytes())

    def close(self):
        if self.proc is not None:
            self.proc.stdin.close()
            self.proc.wait()
            self.proc = None
