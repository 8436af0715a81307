"""Fixed-size socket line protocol (ELITR legacy).

Behavioral twin of the reference's line_packet.py:15-60: each line is sent
as one zero-padded PACKET_SIZE buffer of UTF-8 text; multiple short lines
may share one packet, separated by newlines.
"""
from __future__ import annotations

PACKET_SIZE = 65536


def send_one_line(socket, text: str) -> None:
    """Send one line (newline appended, zero-padded to PACKET_SIZE)."""
    text = text.replace("\0", "\n")
    lines = text.splitlines()
    first = lines[0] if lines else ""
    data = (first + "\n").encode("utf-8")
    if len(data) > PACKET_SIZE:
        data = data[:PACKET_SIZE]
    socket.sendall(data.ljust(PACKET_SIZE, b"\0"))


def receive_one_line(socket) -> str | None:
    """Receive one packet; returns the text up to the first NUL, or None on
    a closed connection."""
    received = b""
    while len(received) < PACKET_SIZE:
        chunk = socket.recv(PACKET_SIZE - len(received))
        if not chunk:
            return None
        received += chunk
        if b"\0" in chunk:
            break
    return received.split(b"\0", 1)[0].decode("utf-8", errors="replace")


def receive_lines(socket) -> list[str] | None:
    text = receive_one_line(socket)
    if text is None:
        return None
    return [ln for ln in text.split("\n") if ln]
