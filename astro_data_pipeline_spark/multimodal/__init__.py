from .binary import media_table, decode_features, sample_frames  # noqa: F401
