import java.io.IOException;
import java.net.URI;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;

/** Test stand-in: serves the s3a:// scheme from the local filesystem
 *  (bucket/authority kept in URIs, object keys resolved as absolute
 *  local paths). Lets read_files + S3Connection run end-to-end in
 *  sandboxes without hadoop-aws or network. */
public class S3StubFileSystem extends RawLocalFileSystem {
  private URI fsUri;

  @Override
  public void initialize(URI name, Configuration conf) throws IOException {
    this.fsUri = URI.create(name.getScheme() + "://" + name.getAuthority());
    super.initialize(name, conf);
  }

  @Override
  public URI getUri() { return fsUri != null ? fsUri : URI.create("file:///"); }

  private Path swizzle(Path p) {
    URI u = p.toUri();
    if (u.getPath() == null) return p;
    return new Path(fsUri.toString() + u.getPath());
  }

  @Override
  public FileStatus getFileStatus(Path f) throws IOException {
    FileStatus s = super.getFileStatus(f);
    s.setPath(swizzle(s.getPath()));
    return s;
  }

  @Override
  public FileStatus[] listStatus(Path f) throws IOException {
    FileStatus[] st = super.listStatus(f);
    for (FileStatus s : st) s.setPath(swizzle(s.getPath()));
    return st;
  }
}
