class ParamScheduler:
    WHERE_EPSILON = 1e-6

    def __call__(self, where):
        raise NotImplementedError


class ConstantParamScheduler(ParamScheduler):
    def __init__(self, value):
        self._value = value

    def __call__(self, where):
        return self._value


class MultiStepParamScheduler(ParamScheduler):
    def __init__(self, values, num_updates=None, milestones=None):
        self._values = values
        self._milestones = milestones or []
        self._num_updates = num_updates

    def __call__(self, where):
        step = where * (self._num_updates or 1)
        i = sum(1 for m in self._milestones if m <= step)
        return self._values[min(i, len(self._values) - 1)]


class CosineParamScheduler(ParamScheduler):
    def __init__(self, start_value, end_value):
        self._start = start_value
        self._end = end_value

    def __call__(self, where):
        import math
        return self._end + 0.5 * (self._start - self._end) * (
            1 + math.cos(math.pi * where))


class LinearParamScheduler(ParamScheduler):
    def __init__(self, start_value, end_value):
        self._start = start_value
        self._end = end_value

    def __call__(self, where):
        return self._start + where * (self._end - self._start)


class CompositeParamScheduler(ParamScheduler):
    def __init__(self, schedulers, lengths, interval_scaling):
        self._schedulers = schedulers
        self._lengths = lengths
        self._interval_scaling = interval_scaling

    def __call__(self, where):
        acc = 0.0
        for s, ln, scale in zip(self._schedulers, self._lengths,
                                self._interval_scaling):
            if where < acc + ln or s is self._schedulers[-1]:
                local = ((where - acc) / ln if scale == "rescaled" else where)
                return s(min(max(local, 0.0), 1.0))
            acc += ln
        return self._schedulers[-1](1.0)


class ExponentialParamScheduler(ParamScheduler):
    def __init__(self, start_value, decay):
        self._start = start_value
        self._decay = decay

    def __call__(self, where):
        return self._start * (self._decay ** where)
