"""Session manager + aiohttp API (the reference's app.py layer)."""

from mere_fusion_tpu.server.app import create_app  # noqa: F401
from mere_fusion_tpu.server.sessions import Session, SessionManager  # noqa: F401
