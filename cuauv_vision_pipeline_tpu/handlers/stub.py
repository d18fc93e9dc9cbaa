"""No-op handler (reference handlers/stub.py)."""

from ..core.handlers import HandlerBase


class StubHandler(HandlerBase):
    def process(self, direction, image, *args, **kwargs):
        pass
