"""Test doubles for storage backends the sandbox cannot reach.

Nothing here runs in production paths; the package exists so the
properties the engine CLAIMS about remote stores (ledger manifest-mode
atomicity on rename-less object stores — the deployment the reference
actually ran on, gs:// buckets per its gcp/job.sh) are executable facts
offline instead of docstring assertions.
"""

from python_darima_spark.testing.fakestore import (  # noqa: F401
    FakeRenamelessFS,
    fake_fs_router,
)
