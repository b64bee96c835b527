from . import transcripts_stream  # noqa: F401
