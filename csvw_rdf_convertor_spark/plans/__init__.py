from . import csvw2rdf, rdf2csvw  # noqa: F401
