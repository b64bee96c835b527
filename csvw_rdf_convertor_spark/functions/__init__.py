from . import cells, ntriples, terms, uritemplate  # noqa: F401
