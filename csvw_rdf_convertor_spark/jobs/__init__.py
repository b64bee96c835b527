"""Cluster job entrypoints (``spark-submit --py-files dist/<pkg>.zip``).

Each module exposes ``main(argv)`` and is launched through the thin repo-root
shim of the same name (spark-submit needs a script file; the package itself
ships in the ``--py-files`` zip built by ``tools/package_pyfiles.py``).
"""
