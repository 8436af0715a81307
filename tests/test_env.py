"""Tests for the dependency-free .env loader and LLM API-key defaults
(reference loads keys via python-dotenv, app.py:10)."""
import os

from mere_fusion_tpu.llm import EchoLLM, OpenAICompatLLM, make_llm
from mere_fusion_tpu.utils.env import env_api_key, load_dotenv


def test_load_dotenv_parses_and_respects_existing(tmp_path, monkeypatch):
    p = tmp_path / ".env"
    p.write_text(
        "# comment\n"
        "OPENAI_API_KEY=sk-filekey\n"
        "export QUOTED='hello world'\n"
        'DOUBLE="two words"\n'
        "SPACED = padded \n"
        "COMMENTED=sk-x # prod key\n"
        'KEEPHASH="a # not-a-comment"\n'
        "NOEQUALS\n"
        "=novalue\n"
    )
    monkeypatch.setenv("OPENAI_API_KEY", "sk-envwins")
    # Pre-seed every key the loader will touch so monkeypatch teardown
    # removes/restores them (delenv on an absent var records nothing and the
    # loaded values would leak into the rest of the pytest session).
    for key in ("QUOTED", "DOUBLE", "SPACED", "COMMENTED", "KEEPHASH"):
        monkeypatch.setenv(key, "pre-seeded")

    loaded = load_dotenv(str(p), override=True)
    assert loaded["OPENAI_API_KEY"] == "sk-filekey"
    assert os.environ["QUOTED"] == "hello world"
    assert os.environ["DOUBLE"] == "two words"
    assert os.environ["SPACED"] == "padded"
    # unquoted trailing ` # comment` is stripped (python-dotenv semantics)
    assert os.environ["COMMENTED"] == "sk-x"
    # quoted values keep embedded hashes
    assert os.environ["KEEPHASH"] == "a # not-a-comment"
    assert "NOEQUALS" not in loaded and "" not in loaded
    assert os.environ["OPENAI_API_KEY"] == "sk-filekey"  # override wins

    monkeypatch.setenv("OPENAI_API_KEY", "sk-envwins")
    monkeypatch.setenv("QUOTED", "pre-existing")
    loaded = load_dotenv(str(p))
    assert loaded["OPENAI_API_KEY"] == "sk-filekey"
    assert os.environ["OPENAI_API_KEY"] == "sk-envwins"  # existing wins
    assert os.environ["QUOTED"] == "pre-existing"


def test_load_dotenv_missing_file_ok(tmp_path):
    assert load_dotenv(str(tmp_path / "absent.env")) == {}


def test_env_api_key_first_nonempty(monkeypatch):
    monkeypatch.delenv("A_KEY", raising=False)
    monkeypatch.setenv("B_KEY", "b")
    assert env_api_key("A_KEY", "B_KEY") == "b"
    assert env_api_key("A_KEY") == ""


def test_make_llm_defaults_api_key_from_env(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-fromenv")
    llm = make_llm("openai")
    assert isinstance(llm, OpenAICompatLLM)
    assert llm.api_key == "sk-fromenv"
    # explicit key wins over the environment
    assert make_llm("openai", api_key="sk-explicit").api_key == "sk-explicit"
    # adapters without an api_key param are unaffected
    assert isinstance(make_llm("echo"), EchoLLM)
