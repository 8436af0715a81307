"""Full-duplex cognition plane: ASR text + scene summaries → LLM → phrases →
avatar TTS."""

from mere_fusion_tpu.brain.orchestrator import BrainSession, split_phrases  # noqa: F401
