from windtpu.io.dataset import DataArray, Dataset, open_dataset, open_mfdataset  # noqa: F401
from windtpu.io.geotiff import open_rasterio  # noqa: F401
