from . import basic, conv, lstm, mel, rel_attention  # noqa: F401
