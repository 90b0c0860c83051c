"""Engine errors, mirroring the reference's `Error` enum
(/root/reference/src/lib.rs:384-400)."""


class RenderError(Exception):
    pass


class TooNarrow(RenderError):
    """The output width was too narrow to render to."""


class CssParseError(RenderError):
    """Invalid CSS."""


class Fail(RenderError):
    """General failure."""
