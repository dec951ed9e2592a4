"""A stand-in 'real decoder' used to test the job-config decoder path:
the job receives 'tests.fake_decoder:decode' as a plain string, exactly
how a production run would name a CLIP/PIL-backed decoder module."""


def decode(payload):
    """payload bytes -> tiny feature vector (sum, len, first, last)."""
    data = bytes(payload)
    return [
        float(sum(data) % 997) / 997.0,
        float(len(data)),
        float(data[0]) if data else 0.0,
        float(data[-1]) if data else 0.0,
    ]
