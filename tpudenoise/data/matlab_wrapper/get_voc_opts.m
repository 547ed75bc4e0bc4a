function opts = get_voc_opts(devkit)
% Load the official VOCdevkit options struct by running VOCinit from the
% devkit's VOCcode directory (the devkit must be installed next to the
% dataset; see README.md).  Bridge for the reference's optional MATLAB
% cross-check (ref lib/datasets/rrData.py:271-284).

here = pwd;
cd(devkit);
try
  addpath('VOCcode');
  VOCinit;          % defines VOCopts in this scope
  opts = VOCopts;
catch err
  rmpath('VOCcode');
  cd(here);
  error('could not run VOCcode/VOCinit under %s: %s', devkit, err.message);
end
rmpath('VOCcode');
cd(here);
