"""Dataset name -> constructor registry (ref lib/datasets/factory.py:21-57):
voc_{2007,2012}_{train,val,trainval,test}, rrData_2021_{train,val,trainval,
test}, coco_{2014,2015}_* (pycocotools when installed, else the in-repo
minimal COCO API)."""

from __future__ import annotations

from tpudenoise.data.voc_like import pascal_voc, rrData

__sets = {}

for year in ['2007', '2012']:
    for split in ['train', 'val', 'trainval', 'test']:
        name = f'voc_{year}_{split}'
        __sets[name] = (lambda split=split, year=year:
                        pascal_voc(split, year))

for year in ['2021']:
    for split in ['train', 'val', 'trainval', 'test']:
        name = f'rrData_{year}_{split}'
        __sets[name] = (lambda split=split, year=year:
                        rrData(split, year))


def _register_coco():
    from tpudenoise.data.coco import coco
    for year in ['2014']:
        for split in ['train', 'val', 'minival', 'valminusminival']:
            name = f'coco_{year}_{split}'
            __sets[name] = (lambda split=split, year=year:
                            coco(split, year))
    for year in ['2015']:
        for split in ['test', 'test-dev']:
            name = f'coco_{year}_{split}'
            __sets[name] = (lambda split=split, year=year:
                            coco(split, year))


_register_coco()


def get_imdb(name: str):
    if name not in __sets:
        raise KeyError(f'Unknown dataset: {name}. '
                       f'Known: {sorted(__sets)}')
    return __sets[name]()


def list_imdbs():
    return sorted(__sets)
