"""Placeholder — filled in by the executor milestone."""
def connect(*a, **k):
    raise NotImplementedError
class Database:  # noqa
    pass
