"""Instationary (space-time all-at-once) control problems -- placeholder,
implemented next."""


class Instationary:
    def __init__(self, *a, **kw):
        raise NotImplementedError("Instationary under construction")
