"""--py-files deployment gate: the package + weight artifacts must work when
imported FROM THE ZIP (spark-submit --py-files semantics), where
__file__-relative weight paths do not exist on disk."""

import os
import subprocess
import sys


def test_zip_packaged_weights_load_and_predict(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "corenlp_spark.zip")
    subprocess.run([sys.executable, os.path.join(repo, "scripts/make_pyfiles.py"),
                    out], check=True, capture_output=True)
    # child process: ONLY the zip on sys.path (cwd far from the repo)
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import corenlp_spark.models.perceptron as P\n"
        "assert '.zip' in P.__file__, P.__file__\n"
        "m = P.AveragedPerceptronTagger.from_broadcastable(P.load_weights('pos'))\n"
        "tags = m.predict(['Barack', 'Obama', 'visited', 'Paris'])\n"
        "assert tags == ['NNP', 'NNP', 'VBD', 'NNP'], tags\n"
        "n = P.StructuredPerceptronNER.from_broadcastable(P.load_weights('ner'))\n"
        "bio = n.decode(['Barack', 'Obama'], ['NNP', 'NNP'])\n"
        "assert bio == ['B-PERSON', 'I-PERSON'], bio\n"
        "print('zip-deploy OK')\n"
    )
    env = dict(os.environ, PYTHONPATH="")
    r = subprocess.run([sys.executable, "-c", probe, out], cwd=str(tmp_path),
                       capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "zip-deploy OK" in r.stdout
