from windtpu.data.noise import FlexibleNoiseGenerator, NoiseGenerator  # noqa: F401
from windtpu.data.decoders import (  # noqa: F401
    NaiveDecoder,
    WindComponentDecoder,
    WindSpeedDecoder,
)
from windtpu.data.providers import (GCSFileProvider, LocalFileProvider,  # noqa: F401
                                    Provider, S3FileProvider)
from windtpu.data.batch import BatchGenerator, SyntheticDayProvider  # noqa: F401
