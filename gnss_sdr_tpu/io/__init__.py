from .native import NativeFileSource, convert, native_available  # noqa: F401
