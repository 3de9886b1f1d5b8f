"""gym.utils shim: only EzPickle (envs/cartpole_swingup.py:12, envs/ur5.py:13)."""


class EzPickle:
    """Records ctor args so the env could be re-instantiated after pickling.

    The reference envs call ``EzPickle.__init__(self)`` with no args and are
    never actually pickled through this path (the reference pickles policy /
    model state, not env objects), so storing the args is all that's needed.
    """

    def __init__(self, *args, **kwargs):
        self._ezpickle_args = args
        self._ezpickle_kwargs = kwargs

    def __getstate__(self):
        return {"_ezpickle_args": self._ezpickle_args, "_ezpickle_kwargs": self._ezpickle_kwargs}

    def __setstate__(self, d):
        out = type(self)(*d["_ezpickle_args"], **d["_ezpickle_kwargs"])
        self.__dict__.update(out.__dict__)
