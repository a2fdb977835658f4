from .curate import CurationConfig, curate  # noqa: F401
