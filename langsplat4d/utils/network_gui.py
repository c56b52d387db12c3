"""TCP viewer bridge — the reference's only inter-process channel
(gaussian_renderer/network_gui.py:26-85): non-blocking listener, JSON camera
messages in, raw RGB bytes out, polled from the training loop
(train.py:166-191).
"""
from __future__ import annotations

import json
import socket
import traceback
from typing import Optional, Tuple

import numpy as np

from langsplat4d.data.cameras import MiniCam

host = "127.0.0.1"
port = 6009
conn: Optional[socket.socket] = None
addr = None
listener: Optional[socket.socket] = None


def init(wish_host: str, wish_port: int) -> None:
    global host, port, listener
    host = wish_host
    port = wish_port
    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind((host, port))
    listener.listen()
    listener.settimeout(0)


def try_connect() -> None:
    global conn, addr
    if listener is None:
        return
    try:
        conn, addr = listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
    except Exception:
        pass


def read() -> dict:
    messageLength = conn.recv(4)
    messageLength = int.from_bytes(messageLength, "little")
    message = conn.recv(messageLength)
    return json.loads(message.decode("utf-8"))


def send(message_bytes: Optional[bytes], verify: str) -> None:
    if message_bytes is not None:
        conn.sendall(message_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def receive() -> Tuple[Optional[MiniCam], bool, bool, bool, bool, float]:
    """-> (custom_cam, do_training, convert_SHs, compute_cov3D, keep_alive,
    scaling_modifier) — message schema of network_gui.py:56-85."""
    message = read()
    width = message["resolution_x"]
    height = message["resolution_y"]
    if width != 0 and height != 0:
        try:
            do_training = bool(message["train"])
            fovy = message["fov_y"]
            fovx = message["fov_x"]
            znear = message["z_near"]
            zfar = message["z_far"]
            convert_SHs = bool(message["shs_python"])
            compute_cov3D = bool(message["rot_scale_python"])
            keep_alive = bool(message["keep_alive"])
            scaling_modifier = message["scaling_modifier"]
            world_view = np.reshape(np.array(message["view_matrix"]),
                                    (4, 4)).astype(np.float32)
            world_view[:, 1] = -world_view[:, 1]
            world_view[:, 2] = -world_view[:, 2]
            full_proj = np.reshape(np.array(message["view_projection_matrix"]),
                                   (4, 4)).astype(np.float32)
            full_proj[:, 1] = -full_proj[:, 1]
            custom_cam = MiniCam(width, height, fovy, fovx, znear, zfar,
                                 world_view, full_proj)
            return (custom_cam, do_training, convert_SHs, compute_cov3D,
                    keep_alive, scaling_modifier)
        except Exception:
            print("")
            traceback.print_exc()
            raise
    return None, None, None, None, None, None
