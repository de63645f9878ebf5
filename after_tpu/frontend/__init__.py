from .server import AfterFrontend, serve  # noqa: F401
