from .npz import load_numpy_data, py2_seed123_permutation, DEV_SIZE
from .iterators import AlignedIterator, UnalignedIterator
from .edges2shoes import load_edges2shoes
from .climate import ClimateSegLoader
from .folder import NumpyDataset, DataLoader, make_dataset, is_numpy_file
