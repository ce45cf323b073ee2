from . import decoder, encoder  # noqa: F401
